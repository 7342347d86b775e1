"""Fixture word banks and gazetteer terms for the deterministic generator.

Derived from FIXTURES.md §1/§3 (which in turn derives from the reference's
unit-test fixtures). No external data.
"""

WORD_BANK = (
    "the quick brown fox jumps over a lazy dog while many small rivers flow "
    "through green valleys and tall mountains rise above quiet villages where "
    "people gather every morning to trade fresh goods books ideas stories and "
    "songs about history science weather travel medicine music art finance "
    "engineering farming cooking sports law language memory networks data "
    "systems models pipelines clusters shards tokens spans documents sections"
).split()

ABBREV_SAMPLES = ["Dr.", "e.g.", "etc.", "i.e.", "Prof.", "vs.", "No."]

ENTITY_TERMS = [
    "New York City", "United Nations", "Albert Einstein", "Marie Curie",
    "World Health Organization", "European Union", "Mount Everest",
    "Pacific Ocean", "Amazon River", "Isaac Newton", "Leonardo da Vinci",
    "San Francisco", "Tokyo", "Berlin", "Paris", "London", "Cairo",
    "UPS", "ECG", "NASA", "UNESCO", "DNA", "HTTP", "SQL",
    "Monty Python", "Sue Jones-Davies", "Vladimir Hachinski",
    "Beuth Hochschule", "Alexander Löser", "Friedrich Schiller",
    "Thomas Martin Lowry", "West Yorkshire", "Low Moor",
    "Hurricane Center", "Freedom House", "Tanzania", "Geneva",
    "Volkswagen Caddy", "Caddy Life", "immune system", "tumor cells",
    "cancer", "molecules", "immunotherapy", "aspirin", "dementia",
]

# Extra short / stopword terms that exercise convertTerms filters
GAZETTEER_TERMS = ENTITY_TERMS + ["ab", "e", "the", "and", "of"]

DE_SENTENCES = [
    "Der Professor arbeitet an der Hochschule für Technik in Berlin.",
    "Die Kraniche des Ibykus ist eine Ballade von Friedrich Schiller.",
    "Das Modell wurde mit vielen Daten über Jahre trainiert.",
    "Eine Übersicht über die Ergebnisse findet sich im Anhang.",
]

MARKUP_SNIPPETS = [
    "<p>This paragraph has <b>bold</b> markup.</p>",
    '<div class="note">A note with &nbsp; entities &amp; symbols.</div>',
    "***LIST*** item one follows here.",
    "========,2,Introduction.",
    "***formula*** appears mid text.",
    "<span>inline</span> tail text.",
]

TOOL_NAMES = ["search", "calculator", "browser", "python", "sql", "shell"]
ROLES = ["user", "assistant", "system", "tool"]


# One distinctive sample sentence per language the detector supports
# (texoo_ray.core.langid; stands in for the optimaize profile set,
# DocumentFactory.java:75-87). Used by the lang_id_multi query and tests.
MULTILINGUAL_SAMPLES = {
    "en": "the quick brown fox jumps over the lazy dog and it was not there",
    "de": "der schnelle braune Fuchs springt über den faulen Hund und ist nicht da",
    "fr": "le renard brun rapide saute par dessus le chien paresseux et il est dans la maison",
    "es": "el zorro marrón rápido salta sobre el perro perezoso y no está en la casa",
    "it": "la volpe marrone veloce salta sopra il cane pigro e non è nella casa",
    "pt": "a raposa marrom rápida salta sobre o cão preguiçoso e não está em casa",
    "nl": "de snelle bruine vos springt over de luie hond en hij is niet in het huis",
    "ru": "быстрая коричневая лиса перепрыгивает через ленивую собаку",
    "el": "η γρήγορη καφέ αλεπού πηδάει πάνω από το τεμπέλικο σκυλί",
    "ar": "الثعلب البني السريع يقفز فوق الكلب الكسول",
    "he": "השועל החום המהיר קופץ מעל הכלב העצלן",
    "hi": "तेज भूरी लोमड़ी आलसी कुत्ते के ऊपर कूदती है",
    "ko": "빠른 갈색 여우가 게으른 개를 뛰어넘습니다",
    "ja": "素早い茶色の狐がのろまな犬を飛び越える",
    "zh": "敏捷的棕色狐狸跳过懒惰的狗",
    "th": "สุนัขจิ้งจอกสีน้ำตาลกระโดดข้ามสุนัขขี้เกียจ",
}
