"""Language-ID tests: one distinctive sample per supported language plus
fallback behavior (reference: optimaize profiles in DocumentFactory)."""

from texoo_ray.core.langid import detect_language
from texoo_ray.sources.fixtures import MULTILINGUAL_SAMPLES as SAMPLES


class TestDetectLanguage:
    def test_each_language(self):
        for lang, text in SAMPLES.items():
            assert detect_language(text) == lang, (lang, text)

    def test_empty_and_undecidable(self):
        assert detect_language("") == ""
        assert detect_language("12345 !!! ???") == ""
        assert detect_language("zzz qqq xxx") == ""

    def test_japanese_kanji_with_kana_beats_zh(self):
        # kanji-heavy but contains kana -> ja, not zh
        assert detect_language("日本語の文章ですが漢字も多いです") == "ja"

    def test_en_de_compat(self):
        # the round-1 behavior the extract router depends on
        assert detect_language("this is a simple test of the system") == "en"
        assert detect_language("das ist ein einfacher Test für das System") == "de"
