"""lnrm parity tests.

Expected values derived from the reference spec (bootleg/utils/
utils.py:259-293): NFD-normalize, drop combining marks, keep
alphanumerics+space, lowercase, collapse whitespace.
"""

from bootleg_spark.functions.lnrm import lnrm, lnrm_ascii_col


def test_basic():
    assert lnrm("Heinrich Böll") == "heinrich boll"
    assert lnrm("  The  ALIAS   is here ") == "the alias is here"
    assert lnrm("St. Mary's") == "st marys"
    assert lnrm("Café-Crème") == "cafecreme"
    assert lnrm("東京") == "東京"  # non-ASCII alnum kept (isalnum() true)
    # tab is neither alnum nor " " → dropped entirely (reference keeps only
    # literal spaces, utils.py:283-290)
    assert lnrm("a  b\tc") == "a bc"


def test_flags():
    assert lnrm("ABC", strip=False, lower=False) == "ABC"
    assert lnrm("Böll", strip=False, lower=True) == "böll"
    # lower=False keeps case but strips (reference branch order)
    assert lnrm("Böll", strip=True, lower=False) == "Boll"


def test_empty_and_punct_only():
    assert lnrm("...") == ""
    assert lnrm("") == ""
    assert lnrm("42") == "42"


def test_ascii_col_matches_python(spark):
    samples = ["Hello, World!", "the  alias  IS here", "St. Mary's", "A-B_C 42", "..."]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = [r["n"] for r in df.select(lnrm_ascii_col(df.s).alias("n")).collect()]
    assert got == [lnrm(s) for s in samples]


def test_ascii_col_matches_python_fuzz(spark):
    # single Spark job over 500 seeded printable-ASCII strings: the JVM
    # expression and the Python reference must agree byte-for-byte on
    # the ASCII domain the fast path claims
    import random
    import string

    rng = random.Random(1234)
    chars = string.ascii_letters + string.digits + string.punctuation + "  "
    samples = [
        "".join(rng.choice(chars) for _ in range(rng.randint(0, 30))) for _ in range(500)
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], ["i", "s"])
    got = {r["i"]: r["n"] for r in df.select("i", lnrm_ascii_col(df.s).alias("n")).collect()}
    for i, s in enumerate(samples):
        assert got[i] == lnrm(s), repr(s)
