

def test_card_scrub_luhn_gates_replacement(spark):
    from ocr_pipeline_spark.operators.pii import (
        CARD_SAMPLES,
        with_card_scrub,
    )

    rows = [(i, t) for i, t in enumerate(CARD_SAMPLES)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["card_scrubbed"], r["n_card"])
        for r in with_card_scrub(df).collect()
    }
    # the four public test-card numbers (spaced, dashed, bare 15, bare
    # 16) are redacted; every Luhn-failing shape survives VERBATIM
    assert got[0] == ("pay with <CARD> now", 1)
    assert got[1] == ("or <CARD> dashed", 1)
    assert got[2] == ("amex <CARD> works too", 1)
    assert got[3] == ("bare <CARD> inline", 1)
    for i in (4, 5, 6, 7, 8):
        assert got[i] == (CARD_SAMPLES[i], 0), i
    assert got[99] == ("", 0)


def test_card_scrub_python_luhn_replay(spark):
    """The Spark-side Luhn must agree with a reference Python Luhn on
    every candidate the shape regex produces."""
    import re

    from ocr_pipeline_spark.operators.pii import (
        CARD_RE,
        CARD_SAMPLES,
        with_card_scrub,
    )

    def luhn_ok(s):
        d = [int(c) for c in s if c.isdigit()]
        total = 0
        for i, v in enumerate(reversed(d)):
            if i % 2 == 1:
                v = v * 2
                if v > 9:
                    v -= 9
            total += v
        return total % 10 == 0

    rows = [(i, t) for i, t in enumerate(CARD_SAMPLES)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_card"] for r in with_card_scrub(df).collect()
    }
    for i, t in rows:
        want = sum(1 for c in re.findall(CARD_RE, t) if luhn_ok(c))
        assert got[i] == want, (i, t)


def test_card_scrub_is_scan_local(spark):
    from ocr_pipeline_spark.operators.pii import with_card_scrub

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = with_card_scrub(docs.select("doc_id", "text"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_card_scrub_luhn_randomized_batch(spark):
    """200 seeded random 13-19 digit numbers, half mutated to break the
    checksum: the Spark-side Luhn must agree with the reference Python
    Luhn on every one (single Spark job, batched)."""
    import random

    from ocr_pipeline_spark.operators.pii import with_card_scrub

    rng = random.Random(20260818)

    def luhn_fix(digits):
        # set the last digit so the number passes Luhn
        total = 0
        for i, c in enumerate(reversed(digits[:-1]), start=1):
            v = int(c)
            if i % 2 == 1:
                v *= 2
                if v > 9:
                    v -= 9
            total += v
        return digits[:-1] + str((10 - total % 10) % 10)

    rows = []
    want = []
    for i in range(200):
        n = rng.randint(13, 19)
        digits = "".join(str(rng.randint(0, 9)) for _ in range(n))
        valid = i % 2 == 0
        digits = luhn_fix(digits) if valid else digits
        # recompute validity (a random number may pass by chance)
        total = 0
        for j, c in enumerate(reversed(digits), start=1):
            v = int(c)
            if j % 2 == 0:
                v *= 2
                if v > 9:
                    v -= 9
            total += v
        rows.append((i, f"num {digits} end"))
        want.append((i, 1 if total % 10 == 0 else 0))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_card"] for r in with_card_scrub(df).collect()
    }
    for i, w in want:
        assert got[i] == w, (i, rows[i])
