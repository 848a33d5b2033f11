"""URL canonicalization/filter parity with the reference semantics.

Vectors derived from /root/reference/tests/test_extractor.py assertions
and extractor.py:17,36-70 behavior (re-derived, not copied)."""
import pandas as pd
from pyspark.sql import functions as F

from sparkharvester.oracle import is_blacklisted_py, is_valid_onion_py
from sparkharvester.urlnorm import (
    canonicalize_expr,
    canonicalize_one,
    is_blacklisted,
    is_valid_onion,
)

V3 = "a" * 56


def test_canonicalize_reference_rules():
    # lowercase scheme+host (extractor.py:64-65)
    assert canonicalize_one(f"HTTP://{V3.upper()}.ONION/Path") \
        == f"http://{V3}.onion/Path"
    # fragment dropped (extractor.py:63/70)
    assert canonicalize_one(f"http://{V3}.onion/p#frag") == f"http://{V3}.onion/p"
    # trailing slash stripped on non-root, root becomes '/'
    assert canonicalize_one(f"http://{V3}.onion/p/") == f"http://{V3}.onion/p"
    assert canonicalize_one(f"http://{V3}.onion/") == f"http://{V3}.onion/"
    assert canonicalize_one(f"http://{V3}.onion") == f"http://{V3}.onion/"
    # query params: empties dropped, rest sorted (extractor.py:68-69)
    assert canonicalize_one(f"http://{V3}.onion/p?b=2&a=1&empty=") \
        == f"http://{V3}.onion/p?a=1&b=2"


def test_onion_validity_reference_rules():
    assert is_valid_onion_py(f"http://{V3}.onion/")
    assert is_valid_onion_py(f"https://{'b' * 56}.onion")
    assert not is_valid_onion_py("http://short.onion/")          # v2 rejected
    assert not is_valid_onion_py(f"http://{'a' * 55}.onion/")
    assert not is_valid_onion_py(f"ftp://{V3}.onion/")
    assert not is_valid_onion_py("https://example.com/")
    assert not is_valid_onion_py(f"http://{V3}.onionx/")


def test_blacklist_reference_rules():
    bl = ["/login", "/register"]
    assert is_blacklisted_py(f"http://{V3}.onion/login", bl)
    assert is_blacklisted_py(f"http://{V3}.onion/LOGIN/", bl)     # case+slash
    assert is_blacklisted_py(f"http://{V3}.onion/user/login", bl)  # suffix
    assert not is_blacklisted_py(f"http://{V3}.onion/blog", bl)
    assert not is_blacklisted_py(f"http://{V3}.onion/loginx", bl)


def test_expr_variants_match_python(spark):
    """The codegen expression versions agree with the urllib versions
    on percent-free URLs (the oracle-checked subset)."""
    urls = [
        f"HTTP://{V3.upper()}.ONION/Page/3/",
        f"http://{V3}.onion/p?b=2&a=1&empty=",
        f"http://{V3}.onion/x#frag",
        f"http://{V3}.onion",
        f"http://{V3}.onion/login",
        f"http://{V3}.onion/user/LOGIN/",
        "https://example.com/notonion",
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    rows = df.select(
        "url",
        canonicalize_expr(F.col("url")).alias("canon"),
        is_valid_onion(F.col("url")).alias("valid"),
        is_blacklisted(F.col("url"), ["/login"]).alias("bl"),
    ).collect()
    for r in rows:
        assert r["canon"] == canonicalize_one(r["url"]), r["url"]
        assert r["valid"] == is_valid_onion_py(r["url"]), r["url"]
        assert r["bl"] == is_blacklisted_py(r["url"], ["/login"]), r["url"]


def test_expr_vs_udf_documented_divergences(spark):
    """Pin the expr/UDF contract at its edges (urlnorm module doc):
    inside the supported domain they agree; empty-key params and raw
    newlines diverge in the documented direction."""
    import pandas as pd
    from pyspark.sql import functions as F

    from sparkharvester.urlnorm import canonicalize_expr, canonicalize_one

    urls = [
        # supported domain: both agree
        "HTTP://AbC.onion/Path/?b=2&a=1&empty=#frag",
        "http://abc.onion/x?z=9&a=1",
        # empty-key param: reference (and UDF) keep '=v', expr drops it
        "http://abc.onion/x?=v&c=3",
        # raw newline: urlsplit strips it (WHATWG), expr keeps it
        "http://abc.onion/x?a=b\nc&d=2",
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    got = [r[0] for r in df.select(canonicalize_expr(F.col("url"))).collect()]
    udf = [canonicalize_one(u) for u in urls]
    assert got[0] == udf[0] == "http://abc.onion/Path?a=1&b=2"
    assert got[1] == udf[1]
    assert udf[2] == "http://abc.onion/x?=v&c=3"
    assert got[2] == "http://abc.onion/x?c=3"
    assert udf[3] == "http://abc.onion/x?a=bc&d=2"
    assert got[3] == "http://abc.onion/x?a=b\nc&d=2"
