"""URL canonicalization (core/url.py) + canonical-URL dedup."""

import pyarrow as pa

from texoo_ray.core.url import normalize_url, normalize_url_array


class TestNormalizeUrl:
    def test_case_and_default_ports(self):
        assert normalize_url("HTTP://EXample.COM:80/A/b") == "http://example.com/A/b"
        assert normalize_url("https://x.com:443/p") == "https://x.com/p"
        # non-default ports survive
        assert normalize_url("http://x.com:8080/p") == "http://x.com:8080/p"
        # :443 is NOT default for http
        assert normalize_url("http://x.com:443/p") == "http://x.com:443/p"

    def test_fragment_and_tracking_params(self):
        assert normalize_url("http://x.com/p#sec") == "http://x.com/p"
        assert (
            normalize_url("http://x.com/p?utm_source=a&b=2&a=1&gclid=z")
            == "http://x.com/p?a=1&b=2"
        )
        # all params tracking -> '?' dropped entirely
        assert normalize_url("http://x.com/p?utm_a=1&ref=r") == "http://x.com/p"

    def test_param_sort_is_bytewise(self):
        assert normalize_url("http://x.com/?b=2&a=1&B=3") == "http://x.com/?B=3&a=1&b=2"

    def test_path_case_and_slash_preserved(self):
        # deliberately NOT normalized: path case, trailing slash, www
        assert normalize_url("http://x.com/A/") == "http://x.com/A/"
        assert normalize_url("http://www.x.com/") == "http://www.x.com/"

    def test_non_urls_pass_through(self):
        assert normalize_url("") == ""
        assert normalize_url("not a url") == "not a url"
        assert normalize_url(None) == ""

    def test_array_with_nulls_and_duplicates(self):
        arr = pa.chunked_array([
            pa.array(["HTTP://A.com:80/x", None, "HTTP://A.com:80/x"], pa.string())
        ])
        out = normalize_url_array(arr).to_pylist()
        assert out == ["http://a.com/x", "", "http://a.com/x"]


def test_url_dedup_collapses_variants(ray_session):
    import ray.data

    from texoo_ray.stages.dedup import url_dedup

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "url": pa.array(
                [
                    "HTTP://Site.COM:80/p?utm_source=x&b=2&a=1#f",
                    "http://site.com/p?a=1&b=2",
                    "http://site.com/p?b=2&a=1",
                    "http://other.com/p?a=1&b=2",
                ],
                pa.string(),
            ),
        }
    )
    out = (
        url_dedup(ray.data.from_arrow(tbl).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 4]
    assert out["dup_count"].tolist() == [3, 1]
    assert out["canonical_url"][0] == "http://site.com/p?a=1&b=2"


class TestHostOf:
    def test_host_rules(self):
        from texoo_ray.core.url import host_of

        assert host_of("HTTP://WWW.EXample.COM:80/A/b") == "www.example.com"
        assert host_of("https://x.com:443/p") == "x.com"
        assert host_of("http://x.com:8080/p") == "x.com:8080"
        assert host_of("not a url") == ""
        assert host_of(None) == ""

    def test_host_array_nulls_dups(self):
        from texoo_ray.core.url import host_array

        arr = pa.chunked_array(
            [pa.array(["HTTP://A.com:80/x", None, "http://A.COM/y"], pa.string())]
        )
        assert host_array(arr).to_pylist() == ["a.com", "", "a.com"]


def test_host_cap_keeps_k_smallest_ids(ray_session):
    import ray.data

    from texoo_ray.pipelines.curation import host_cap

    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(1, 9)), pa.int64()),
            "url": pa.array(
                [
                    "http://a.com/1",
                    "HTTP://A.COM:80/2",
                    "http://a.com/3",
                    "http://b.com/4",
                    "http://a.com/5",
                    "http://b.com/6",
                    "http://a.com/6b",
                    "http://www.a.com/7",  # distinct host from a.com
                ],
                pa.string(),
            ),
        }
    )
    out = (
        host_cap(ray.data.from_arrow(tbl).repartition(3), k=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # a.com has ids 1,2,3,5,7 -> keep 1,2,3; b.com keeps 4,6; www.a.com keeps 8
    assert out["doc_id"].tolist() == [1, 2, 3, 4, 6, 8]
    assert out.loc[out["doc_id"] == 8, "host"].item() == "www.a.com"


def test_domain_block_suffix_vs_exact(ray_session):
    import ray.data

    from texoo_ray.pipelines.curation import domain_block

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "url": pa.array(
                [
                    "http://bad.com/x",        # exact block
                    "http://ads.bad.com/x",    # suffix block
                    "http://notbad.com/x",     # NOT blocked (no dot boundary)
                    "http://www.good.com/x",   # exact block of the www host only
                    "http://good.com/x",       # survives
                ],
                pa.string(),
            ),
        }
    )
    out = (
        domain_block(
            ray.data.from_arrow(tbl).repartition(2),
            blocked=["bad.com", "www.good.com"],
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["doc_id"].tolist() == [3, 5]
