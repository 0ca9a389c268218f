"""carpet-spark CLI — the reference's product surface, distributed.

curology/carpet is a single-file Parquet PII-removal command
(BASELINE.json:6: "Parquet PII removal ... DataFrame read/transform/write");
this is that command on Spark: same knobs (drop / nullify / hash / mask /
bucket per column), any input size, partitioned output.

    python -m carpet_spark.cli INPUT OUTPUT \
        --drop c_name --nullify c_acctbal \
        --hash c_custkey --hash-salt s3cret \
        --mask c_comment --mask-pattern '[0-9]' --mask-replacement X \
        --bucket c_acctbal --bucket-width 1000 \
        --partition-by c_mktsegment

Scale notes: the whole pipeline is one narrow projection over a distributed
scan — no shuffle unless --partition-by asks for a partitioned layout;
column pruning means dropped columns are never read.
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


@dataclass
class PIIConfig:
    """Column-level redaction plan (the reference's config surface)."""

    drop: list[str] = field(default_factory=list)
    nullify: list[str] = field(default_factory=list)
    hash: list[str] = field(default_factory=list)
    hash_salt: str = ""
    mask: list[str] = field(default_factory=list)
    mask_pattern: str = r"[0-9]"
    mask_replacement: str = "X"
    bucket: list[str] = field(default_factory=list)
    bucket_width: float = 1000.0


def apply_pii(df: DataFrame, cfg: PIIConfig) -> DataFrame:
    """Apply the redaction plan as a single narrow projection.

    Order of operations on a column that appears in several lists:
    drop wins; then nullify; then hash/mask/bucket transform in place.
    """
    for c in cfg.nullify:
        if c in df.columns and c not in cfg.drop:
            df = df.withColumn(c, F.lit(None).cast(df.schema[c].dataType))
    for c in cfg.hash:
        if c in df.columns and c not in cfg.drop:
            df = df.withColumn(
                c, F.sha2(F.concat(F.lit(cfg.hash_salt), F.col(c).cast("string")), 256)
            )
    for c in cfg.mask:
        if c in df.columns and c not in cfg.drop:
            df = df.withColumn(
                c, F.regexp_replace(F.col(c), cfg.mask_pattern, cfg.mask_replacement)
            )
    for c in cfg.bucket:
        if c in df.columns and c not in cfg.drop and c not in cfg.nullify:
            df = df.withColumn(c, F.floor(F.col(c) / cfg.bucket_width))
    if cfg.drop:
        df = df.drop(*[c for c in cfg.drop if c in df.columns])
    return df


def _main_query(argv: list[str]) -> None:
    """`carpet-spark query OP`: run any registered operator and print or
    write its result — the whole 183-op registry as a command-line product.

    python -m carpet_spark.cli query dedup_near_minhash \
        --sf-dir /root/testdata/sf0.01 --limit 20 [--output out.parquet]
    """
    p = argparse.ArgumentParser(prog="carpet-spark query")
    p.add_argument("op", help="registered operator id (see `ops` subcommand)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--output", help="write result parquet here instead of stdout")
    p.add_argument("--limit", type=int, default=20, help="stdout row cap")
    p.add_argument("--explain", action="store_true", help="print the physical plan")
    args = p.parse_args(argv)

    from .registry import REGISTRY
    from .session import get_spark

    if args.op not in REGISTRY:
        raise SystemExit(f"unknown op {args.op!r}; run: carpet-spark ops")
    spark = get_spark("carpet_spark_cli")
    df = REGISTRY[args.op].fn(spark, args.sf_dir)
    if args.explain:
        df.explain(mode="formatted")
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    else:
        df.show(args.limit, truncate=False)


def _main_ops() -> None:
    from .registry import REGISTRY

    for name, op in sorted(REGISTRY.items()):
        kind = "hash-oracle" if op.oracle else "rows-only"
        print(f"{name:32s} {kind}")


def _main_verify(argv: list[str]) -> None:
    """`carpet-spark verify OP [OP ...]`: run operators against their
    DuckDB oracles and report PASS/FAIL — the engine's parity gate as a
    user-facing command, so an operator can be trusted on a new dataset
    layout before it goes into a pipeline.

    python -m carpet_spark.cli verify dedup_exact agg_groupby \
        --sf-dir /root/testdata/sf0.01
    """
    p = argparse.ArgumentParser(prog="carpet-spark verify")
    p.add_argument("ops", nargs="+", help="registered operator ids")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = p.parse_args(argv)

    from .registry import REGISTRY
    from .session import get_spark
    from .testing import compare, duck_connect

    unknown = [o for o in args.ops if o not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown ops {unknown}; run: carpet-spark ops")
    spark = get_spark("carpet_spark_cli")
    con = duck_connect(args.sf_dir)
    failed = 0
    for name in args.ops:
        op = REGISTRY[name]
        df = op.fn(spark, args.sf_dir)
        if op.oracle is None:
            n = df.count()
            print(f"ROWS  {name}: {n} rows (no oracle; rows-only contract)")
            continue
        try:
            compare(df, con, op.oracle, name=name)
            print(f"PASS  {name}")
        except AssertionError as e:
            failed += 1
            print(f"FAIL  {name}: {e}")
    con.close()
    if failed:
        raise SystemExit(1)


def main(argv: list[str] | None = None) -> None:
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "query":
        import carpet_spark.ops  # noqa: F401  (registration side-effects)

        return _main_query(argv[1:])
    if argv and argv[0] == "ops":
        import carpet_spark.ops  # noqa: F401

        return _main_ops()
    if argv and argv[0] == "verify":
        import carpet_spark.ops  # noqa: F401

        return _main_verify(argv[1:])
    p = argparse.ArgumentParser(prog="carpet-spark", description=__doc__)
    p.add_argument("input", help="input parquet path/glob")
    p.add_argument("output", help="output parquet directory")
    p.add_argument("--drop", action="append", default=[], metavar="COL")
    p.add_argument("--nullify", action="append", default=[], metavar="COL")
    p.add_argument("--hash", action="append", default=[], metavar="COL")
    p.add_argument("--hash-salt", default="")
    p.add_argument("--mask", action="append", default=[], metavar="COL")
    p.add_argument("--mask-pattern", default=r"[0-9]")
    p.add_argument("--mask-replacement", default="X")
    p.add_argument("--bucket", action="append", default=[], metavar="COL")
    p.add_argument("--bucket-width", type=float, default=1000.0)
    p.add_argument("--partition-by", action="append", default=[], metavar="COL")
    args = p.parse_args(argv)

    from .session import get_spark

    spark = get_spark("carpet_spark_cli")
    cfg = PIIConfig(
        drop=args.drop,
        nullify=args.nullify,
        hash=args.hash,
        hash_salt=args.hash_salt,
        mask=args.mask,
        mask_pattern=args.mask_pattern,
        mask_replacement=args.mask_replacement,
        bucket=args.bucket,
        bucket_width=args.bucket_width,
    )
    out = apply_pii(spark.read.parquet(args.input), cfg)
    writer = out.write.mode("overwrite")
    if args.partition_by:
        writer = writer.partitionBy(*args.partition_by)
    writer.parquet(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
