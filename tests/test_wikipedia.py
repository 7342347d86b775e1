"""WikipediaIndex: SQL-dump parsing, redirect-chase lookups, link stage.

Semantics mirrored from texoo-retrieval/.../preprocess/WikipediaIndex.java
(line citations in the module docstrings)."""

import pyarrow as pa

from texoo_ray.stages.wikipedia import WikipediaIndex, WikiLinkStage, _split_sql_tuples

# page dump schema as read by WikipediaIndex.java:72-76: field 5 is
# page_is_redirect (pre-2017 dumps: page_counter sits at field 4)
PAGE_SQL = (
    "INSERT INTO `page` VALUES "
    "(1,0,'Berlin','',7,0,0,0.5,'2020','2020',100,200,'wikitext',NULL),"
    "(2,0,'Germany_capital','',3,1,0,0.5,'2020','2020',100,200,'wikitext',NULL),"
    "(3,0,'Rome_(disambiguation)','',1,0,0,0.5,'2020','2020',100,200,'wikitext',NULL),"
    "(4,1,'Talk:Berlin','',0,0,0,0.5,'2020','2020',100,200,'wikitext',NULL),"
    "(5,0,'O''Hare','',2,0,0,0.5,'2020','2020',100,200,'wikitext',NULL);"
)
REDIRECT_SQL = (
    "INSERT INTO `redirect` VALUES "
    "(2,0,'Berlin','',''),"
    "(9,1,'Talk:Else','','');"
)


class TestSqlParsing:
    def test_tuples_split_and_unescape(self):
        rows = list(_split_sql_tuples(PAGE_SQL, "INSERT INTO `page` VALUES"))
        assert len(rows) == 5
        assert rows[0][0] == "1" and rows[0][2] == "Berlin"
        # quoted '' -> ' (mysqldump uses \' but commons-csv also handles '')
        assert rows[4][2] == "O'Hare" or rows[4][2] == "OHare"
        assert rows[0][13] is None  # NULL -> None

    def test_backslash_escape(self):
        line = "INSERT INTO `page` VALUES (7,0,'A\\'B\\\\C','',0,0,1);"
        rows = list(_split_sql_tuples(line, "INSERT INTO `page` VALUES"))
        assert rows[0][2] == "A'B\\C"


class TestIndex:
    def _index(self):
        idx = WikipediaIndex()
        idx.read_pages([PAGE_SQL, "-- comment line ignored"])
        idx.read_redirects([REDIRECT_SQL])
        return idx

    def test_entities_skip_redirects_disambig_nonmain(self):
        idx = self._index()
        # entity map: Berlin + O'Hare (redirect 2, disambig 3, ns-1 4 skipped)
        assert set(idx.page_titles.values()) == {"Berlin", "O'Hare"}
        # title index keeps redirects too
        assert idx.page_index["Germany_capital"] == 2
        assert idx.count_pages() == 2

    def test_redirect_chase_and_uppercase_retry(self):
        idx = self._index()
        assert idx.get_id_for_title("Berlin") == 1
        # redirect: Germany_capital -> Berlin
        assert idx.get_id_for_title("Germany_capital") == 1
        assert idx.get_title_from_redirect("Germany_capital") == "Berlin"
        # first-char-uppercase retry (WikipediaIndex.java:188-191)
        assert idx.get_id_for_title("berlin") == 1
        assert idx.get_id_for_title("unknown page") is None
        assert idx.matched == 4 and idx.unmatched == 1

    def test_cyclic_redirect_short_circuits(self):
        idx = WikipediaIndex().from_tables(
            pages=[(1, 0, "A", True), (2, 0, "B", True)],
            redirects=[(1, 0, "B"), (2, 0, "A")],
        )
        # chase A -> B -> A: cyclic, returns the id where the cycle closes
        assert idx.get_id_for_title("A") == 2

    def test_uri_mapping_and_fallback(self):
        idx = self._index()
        # no mapping loaded -> falls back to redirect-resolved title
        assert idx.get_uri_for_title("Germany_capital") == "Berlin"
        idx.read_id_mapping(["Berlin\tQ64", "http://en.wikipedia.org/wiki/O%27Hare\tQ9"])
        assert idx.get_uri_for_title("Berlin") == "Q64"
        assert idx.get_title_for_uri("Q64") == "Berlin"
        assert idx.get_title_for_uri("Q9") == "O'Hare"

    def test_filter_pages_resolves_redirects(self):
        idx = self._index()
        idx.filter_pages(["Germany_capital"])
        assert idx.page_titles == {1: "Berlin"}


class TestLinkStage:
    def test_broadcast_link_stage(self, ray_session):
        import ray
        import ray.data

        idx = WikipediaIndex()
        idx.read_pages([PAGE_SQL])
        idx.read_redirects([REDIRECT_SQL])
        ref = ray.put(idx)
        ds = ray.data.from_arrow(
            pa.table({"title": ["Berlin", "Germany_capital", "nope"]})
        )
        out = (
            ds.map_batches(
                WikiLinkStage,
                fn_constructor_kwargs=dict(index_ref=ref),
                batch_format="pyarrow",
                concurrency=1,
            )
            .to_pandas()
            .sort_values("title")
        )
        by_title = out.set_index("title")
        assert by_title.loc["Berlin", "page_id"] == 1
        assert by_title.loc["Germany_capital", "page_id"] == 1
        assert by_title.loc["Germany_capital", "resolved_title"] == "Berlin"
        assert by_title.loc["nope", "page_id"] == -1
