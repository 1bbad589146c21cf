"""Property-based canonicalizer invariants (hypothesis → one Spark job per
example batch): idempotence, lowercase scheme/host, fbclid stripping, sorted
query params, default-port removal. The canonicalizer runs on every frontier
round, so these invariants are what the URL-seen set's correctness rests on."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from facebook_page_scrapy_spark.functions import urls as U

_label = st.text(alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789", min_size=1, max_size=8)


@st.composite
def _url(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https", "hTTps"]))
    host = ".".join(draw(st.lists(_label, min_size=2, max_size=4)))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    n_seg = draw(st.integers(0, 3))
    path = "".join("/" + draw(_label) for _ in range(n_seg))
    n_par = draw(st.integers(0, 4))
    params = [
        draw(_label) + "=" + draw(_label) for _ in range(n_par)
    ] + draw(st.lists(st.sampled_from(["fbclid=XYZ123", "fbclid"]), max_size=2))
    query = "?" + "&".join(params) if params else ""
    frag = draw(st.sampled_from(["", "#frag", "#a=b"]))
    return f"{scheme}://{host}{port}{path}{query}{frag}"


@settings(max_examples=4, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_url(), min_size=32, max_size=64))
def test_canonicalize_properties(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        "url",
        U.canonicalize(F.col("url")).alias("c1"),
        U.canonicalize(U.canonicalize(F.col("url"))).alias("c2"),
    ).collect()
    for r in out:
        assert r.c1 is not None, r.url
        # idempotence: canonical form is a fixed point
        assert r.c1 == r.c2, (r.url, r.c1, r.c2)
        scheme, rest = r.c1.split("://", 1)
        authority = rest.split("/", 1)[0]
        assert scheme == scheme.lower() and authority == authority.lower()
        # default ports stripped; non-default ports kept
        assert not (scheme == "http" and authority.endswith(":80"))
        assert not (scheme == "https" and authority.endswith(":443"))
        if ":8080" in r.url.split("/", 3)[2]:
            assert authority.endswith(":8080")
        # fragment dropped, fbclid stripped, params sorted
        assert "#" not in r.c1
        if "?" in r.c1:
            q = r.c1.split("?", 1)[1]
            parts = q.split("&")
            assert parts == sorted(parts)
            assert not any(p == "fbclid" or p.startswith("fbclid=") for p in parts)
        # path always present
        assert "/" in rest
