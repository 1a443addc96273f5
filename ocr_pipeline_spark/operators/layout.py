"""Z-order (Morton-interleaved) clustered layout for data-skipping writes.

Why this exists at 100 TB: parquet row-group / file min-max statistics
only prune scans when values are CLUSTERED within files. Range
partitioning on one column clusters only that column; Z-ordering
interleaves the bits of k quantized key columns so every output file
covers a tight hyper-rectangle in all k dimensions at once — selective
predicates on ANY of the keys then skip most files at planning time.
Reference analogue: the reference serves per-request result lookups from
its store (pipeline/app.py result fetch); at corpus scale the same need
— selective reads over a huge result table — is served by physical
layout, not an index server.

Cross-engine contract: z-values are pure bigint arithmetic — quantize is
subtract-min, scale by (2^bits − 1), integral ``div`` by the span;
interleave is a shift/mask/or fold. Both the Spark Column builder and
the DuckDB SQL builder consume ONE shared term enumeration
(:func:`_zterms`), so the engines compute bit-identical z-values
(driver query ``sp_zorder``; unit parity in tests/test_layout.py).

Scale notes:
- :func:`with_zvalue` with computed bounds costs ONE extra bounds scan
  (min/max aggregate, broadcast back as a 1-row scalar join — no
  collect); pass explicit ``bounds`` to make it single-scan when the
  domain is known (dates, id ranges).
- :func:`write_zorder` range-partitions on the z-value, so file count is
  an explicit dial: at 100 TB pick ``n_files = bytes / target_file_size``
  (e.g. 1 GiB targets). Only the z-long and the row payload move in that
  one exchange; quantization is scan-local.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zvalue",
    "zvalue_sql",
    "with_zvalue",
    "write_zorder",
    "ZBITS",
]

ZBITS = 16


def _zterms(k: int, bits: int) -> list[tuple[int, int, int]]:
    """Shared (col_idx, bit_idx, out_shift) enumeration — the single
    source of truth for both engines' interleave expressions."""
    return [(c, i, i * k + c) for c in range(k) for i in range(bits)]


def zvalue(qcols: list[Column], bits: int = ZBITS) -> Column:
    """Morton interleave of ALREADY-quantized long columns (each in
    [0, 2^bits)). Plain shift/mask/or fold — whole-stage codegen, no
    Python. Callers must pass staged column REFERENCES (each input is
    referenced ``bits`` times; Catalyst has no logical CSE, but a
    col-ref re-read is free)."""
    z: Column | None = None
    for c, i, shift in _zterms(len(qcols), bits):
        term = F.shiftleft(F.shiftright(qcols[c], i).bitwiseAND(F.lit(1)), shift)
        z = term if z is None else z.bitwiseOR(term)
    assert z is not None
    return z


def zvalue_sql(qnames: list[str], bits: int = ZBITS) -> str:
    """DuckDB expression computing the same z-value over bigint columns
    named ``qnames`` — generated from the same :func:`_zterms`
    enumeration as :func:`zvalue`."""
    terms = [
        f"((({qnames[c]} >> {i}) & 1) << {shift})"
        for c, i, shift in _zterms(len(qnames), bits)
    ]
    return " | ".join(terms)


def with_zvalue(
    df: DataFrame,
    cols: list[str],
    bits: int = ZBITS,
    bounds: list[tuple[int, int]] | None = None,
    out: str = "zval",
) -> DataFrame:
    """Append a z-value column interleaving the quantized ``cols``
    (integer-valued column NAMES — stage derived keys, e.g. a
    day-number, with ``withColumn`` first so the DuckDB mirror can name
    the same columns).

    quantized_c = ((c − lo_c) · (2^bits − 1)) div max(hi_c − lo_c, 1),
    all bigint (integral ``div``, never float — a 53-bit mantissa can
    flip a boundary value; same rule as splits.pack_sequences). Bounds
    default to a min/max pre-scan broadcast back as a 1-row scalar
    join; pass ``bounds=[(lo, hi), ...]`` to skip that scan."""
    mask = (1 << bits) - 1
    if bounds is not None:
        if len(bounds) != len(cols):
            raise ValueError("bounds must match cols 1:1")
        j = df
        lohi = {i: (int(lo), int(hi)) for i, (lo, hi) in enumerate(bounds)}
        qexprs = [
            F.expr(
                f"(cast({c} as bigint) - {lohi[i][0]}) * {mask} "
                f"div greatest({lohi[i][1]} - {lohi[i][0]}, 1)"
            ).alias(f"_q{i}")
            for i, c in enumerate(cols)
        ]
    else:
        aggs = []
        for i, c in enumerate(cols):
            aggs.append(F.min(c).cast("bigint").alias(f"_lo{i}"))
            aggs.append(F.max(c).cast("bigint").alias(f"_hi{i}"))
        j = df.crossJoin(F.broadcast(df.agg(*aggs)))
        qexprs = [
            F.expr(
                f"(cast({c} as bigint) - _lo{i}) * {mask} "
                f"div greatest(_hi{i} - _lo{i}, 1)"
            ).alias(f"_q{i}")
            for i, c in enumerate(cols)
        ]
    staged = j.select(*[df[c2] for c2 in df.columns], *qexprs)
    qrefs = [F.col(f"_q{i}") for i in range(len(cols))]
    return staged.select(
        *df.columns, zvalue(qrefs, bits).cast("long").alias(out)
    )


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = ZBITS,
    bounds: list[tuple[int, int]] | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the z-value of ``cols``:
    range-partition on z (each file owns one contiguous z interval ⇒ a
    tight hyper-rectangle in every key dimension), sort within
    partitions by z so row groups inherit the clustering too. The
    z-value itself is dropped — it is a layout device, not data."""
    z = with_zvalue(df, cols, bits=bits, bounds=bounds)
    (
        z.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )
