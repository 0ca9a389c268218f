"""Category C — PII / data-format ops: the reference's own surface.

curology/carpet is a single-file Parquet PII-removal tool (BASELINE.json:6;
SURVEY §0 — /root/reference is empty, so parity is to the driver's binding
description, not file:line cites).  Re-expressed Spark-first, each redaction
is a narrow projection over a distributed scan: at 100 TB these run as
column-level rewrites with full pushdown, no shuffle at all.

PII targets per FIXTURES.md: customer.c_name (drop/hash/mask),
customer.c_acctbal (drop/nullify/bucket).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..exprs import fp_scaled_long, fp_split_sum_of
from ..registry import register
from ..tables import load

PII_COLS = ("c_name", "c_acctbal")
HASH_SALT = "carpet-salt:"


@register(
    "pii_drop",
    oracle="SELECT c_custkey, c_nationkey, c_mktsegment FROM customer",
)
def pii_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove configured PII columns entirely (schema-changing redaction) —
    the reference's core operation.  Column pruning means the dropped
    columns are never read from disk."""
    return load(spark, sf_dir, "customer").drop(*PII_COLS)


@register(
    "pii_nullify",
    oracle="""
    SELECT c_custkey,
           CAST(NULL AS VARCHAR) AS c_name,
           c_nationkey,
           CAST(NULL AS DOUBLE) AS c_acctbal,
           c_mktsegment
    FROM customer
    """,
)
def pii_nullify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-preserving redaction: keep the column, null every value."""
    df = load(spark, sf_dir, "customer")
    df = df.withColumn("c_name", F.lit(None).cast("string"))
    df = df.withColumn("c_acctbal", F.lit(None).cast("double"))
    return df


@register(
    "pii_hash",
    oracle=f"""
    SELECT c_custkey,
           sha256('{HASH_SALT}' || c_name) AS name_token,
           c_mktsegment
    FROM customer
    """,
)
def pii_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irreversible salted tokenization: sha256(salt || name).  Stable
    tokens keep joinability across tables without exposing the value.
    Both engines emit lowercase hex (SURVEY §2.C [verified])."""
    df = load(spark, sf_dir, "customer")
    return df.select(
        "c_custkey",
        F.sha2(F.concat(F.lit(HASH_SALT), F.col("c_name")), 256).alias("name_token"),
        "c_mktsegment",
    )


@register(
    "pii_mask_regex",
    oracle=r"""
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]', 'X', 'g') AS name_masked,
           regexp_replace(c_name || '@example.com', '[A-Za-z0-9.#]+@[A-Za-z0-9.]+',
                          '<EMAIL>', 'g') AS contact_masked
    FROM customer
    """,
)
def pii_mask_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern-based masking of digit runs and email-shaped substrings in
    free text.  DuckDB needs the 'g' flag to match Spark's replace-all
    semantics (SURVEY §2.C); patterns stay in the Java∩RE2 subset."""
    df = load(spark, sf_dir, "customer")
    email_like = F.concat(F.col("c_name"), F.lit("@example.com"))
    return df.select(
        "c_custkey",
        F.regexp_replace(F.col("c_name"), "[0-9]", "X").alias("name_masked"),
        F.regexp_replace(email_like, r"[A-Za-z0-9.#]+@[A-Za-z0-9.]+", "<EMAIL>").alias(
            "contact_masked"
        ),
    )


@register(
    "pii_bucket",
    oracle="""
    SELECT c_custkey,
           CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS acctbal_bucket,
           c_mktsegment
    FROM customer
    """,
)
def pii_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalize a quasi-identifier to a coarse bucket (k-anonymity-style):
    exact balance → 1000-wide bucket index (floor handles negatives)."""
    df = load(spark, sf_dir, "customer")
    return df.select(
        "c_custkey",
        F.floor(F.col("c_acctbal") / 1000.0).alias("acctbal_bucket"),
        "c_mktsegment",
    )


@register(
    "pii_pipeline",
    oracle=f"""
    SELECT c_custkey,
           sha256('{HASH_SALT}' || c_name) AS c_name,
           c_nationkey,
           CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS c_acctbal,
           regexp_replace(c_mktsegment, '[AEIOU]', '*', 'g') AS c_mktsegment
    FROM customer
    """,
)
def pii_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite config-driven redaction pipeline (carpet_spark.cli's
    apply_pii): hash + bucket + mask applied in one narrow projection —
    exactly what the reference CLI does per file, here over a distributed
    scan with zero shuffle."""
    from ..cli import PIIConfig, apply_pii

    cfg = PIIConfig(
        hash=["c_name"],
        hash_salt=HASH_SALT,
        bucket=["c_acctbal"],
        bucket_width=1000.0,
        mask=["c_mktsegment"],
        mask_pattern="[AEIOU]",
        mask_replacement="*",
    )
    return apply_pii(load(spark, sf_dir, "customer"), cfg)


@register(
    "pii_kanon_check",
    oracle="""
    SELECT c_nationkey, acctbal_bucket, COUNT(*) AS group_size,
           COUNT(*) >= 5 AS k_ok
    FROM (
      SELECT c_nationkey, CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS acctbal_bucket
      FROM customer
    )
    GROUP BY c_nationkey, acctbal_bucket
    """,
)
def pii_kanon_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the generalized quasi-identifiers (nation x
    balance bucket): group sizes + a k>=5 flag per equivalence class — the
    verification step after pii_bucket generalization.  One groupBy, scales
    like any aggregate."""
    df = load(spark, sf_dir, "customer")
    return (
        df.select(
            "c_nationkey", F.floor(F.col("c_acctbal") / 1000.0).alias("acctbal_bucket")
        )
        .groupBy("c_nationkey", "acctbal_bucket")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .withColumn("k_ok", F.col("group_size") >= 5)
    )


@register(
    "pii_noisy_count_laplace",
    oracle="""
    WITH g AS (
      SELECT c_mktsegment, COUNT(*) AS true_n FROM customer GROUP BY c_mktsegment
    ),
    u AS (
      SELECT c_mktsegment, true_n,
             ('0x' || substr(md5('noise|' || c_mktsegment), 1, 15))::BIGINT
               / 1152921504606846976.0 AS u01
      FROM g
    )
    SELECT c_mktsegment, true_n,
           ROUND(true_n - 2.0 * sign(u01 - 0.5)
                 * ln(1.0 - 2.0 * abs(u01 - 0.5)), 6) AS noisy_n
    FROM u
    """,
)
def pii_noisy_count_laplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism noisy counts (the differential-privacy release
    shape, epsilon = 0.5 -> scale b = 2): per-group counts plus
    inverse-CDF Laplace noise.  The uniform draw is DERIVED from a keyed
    md5 (15 hex chars / 16^15) instead of an RNG — deliberately, so both
    engines compute the identical release and the mechanism's arithmetic
    is hash-verifiable end-to-end; a production deployment swaps the
    digest for a real RNG (one-line change) and loses only the oracle,
    not the shape.  ln() is libm-vs-Java-ulp territory -> round(6).

    Scale: the noise is a per-GROUP scalar projection after the count
    aggregate — released aggregates are tiny regardless of input size."""
    c = load(spark, sf_dir, "customer")
    g = c.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("true_n"))
    u01 = F.conv(
        F.substring(F.md5(F.concat(F.lit("noise|"), F.col("c_mktsegment"))), 1, 15),
        16,
        10,
    ).cast("long") / F.lit(float(16**15))
    centered = u01 - 0.5
    noise = -2.0 * F.signum(centered) * F.log(1.0 - 2.0 * F.abs(centered))
    return g.select(
        "c_mktsegment",
        "true_n",
        F.round(F.col("true_n") + noise, 6).alias("noisy_n"),
    )


@register(
    "pii_encrypt_roundtrip",
    oracle="""
    SELECT c_custkey, c_name AS decrypted, length(c_name) AS orig_len
    FROM customer
    """,
)
def pii_encrypt_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level AES encryption through a write/read/decrypt cycle —
    the PII-at-rest pattern beyond masking: aes_encrypt the name column,
    persist ONLY the ciphertext to parquet, read it back, aes_decrypt.
    The hash oracle is the identity on the source — one corrupted or
    mis-keyed byte anywhere in encrypt→sink→scan→decrypt breaks it.

    ECB mode is used DELIBERATELY and with the standard caveat: it is the
    only deterministic mode (GCM/CBC salt a random IV per call, which is
    what production wants but no equality oracle can check); equal
    plaintexts ⇒ equal ciphertexts under ECB, so treat it here as the
    testable stand-in — the API call is identical with mode='GCM'.
    Scale: both transforms are narrow JVM projections; the stored table
    holds ciphertext only, so a leaked data lake leaks nothing readable."""
    from .scans import _sink_path

    c = load(spark, sf_dir, "customer")
    key = F.lit("0123456789abcdef")  # 16-byte demo key; prod: KMS-managed
    enc = c.select(
        "c_custkey",
        F.aes_encrypt(F.col("c_name").cast("binary"), key, F.lit("ECB")).alias(
            "name_ct"
        ),
        F.length("c_name").alias("orig_len"),
    )
    out = _sink_path(spark, "pii_encrypted")
    enc.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return back.select(
        "c_custkey",
        F.aes_decrypt(F.col("name_ct"), key, F.lit("ECB")).cast("string").alias(
            "decrypted"
        ),
        "orig_len",
    )


@register(
    "pii_retention_sweep",
    oracle="""
    WITH cutoff AS (
      SELECT MAX(ts) - INTERVAL 7 DAY AS c FROM events
    ),
    activity AS (
      SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT
      COUNT(*) FILTER (WHERE last_ts < (SELECT c FROM cutoff))
        AS n_users_purged,
      CAST(COALESCE(SUM(n_events) FILTER (
        WHERE last_ts < (SELECT c FROM cutoff)), 0) AS BIGINT)
        AS n_events_purged,
      COUNT(*) FILTER (WHERE last_ts >= (SELECT c FROM cutoff))
        AS n_users_kept,
      CAST(COALESCE(SUM(n_events) FILTER (
        WHERE last_ts >= (SELECT c FROM cutoff)), 0) AS BIGINT)
        AS n_events_kept
    FROM activity
    """,
)
def pii_retention_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-retention sweep accounting (GDPR storage-limitation): find
    users whose LAST activity predates the retention cutoff (7 days
    before the newest event — anchored to data time, not wall clock, so
    the op is deterministic and replayable) and report how many users
    and events a purge would remove vs keep.  This is the dry-run
    report; the purge itself is the same plan with the aggregate swapped
    for an anti-join writer (pii_drop's delete path).

    Scale (100 TB): one |users|-key aggregate over the fact table
    (map-side combined), a 1-row global-max broadcast for the cutoff,
    then a single-row reduction — the full text/event payload is never
    shuffled, only (user, last_ts, count) triples.  The real purge
    rewrites only partitions containing affected users (dynamic
    partition overwrite, sink_dynamic_partition_overwrite's shape)."""
    ev = load(spark, sf_dir, "events")
    activity = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"), F.count(F.lit(1)).alias("n_events")
    )
    cutoff = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAY")).alias("c")
    )
    purged = F.col("last_ts") < F.col("c")
    return activity.join(F.broadcast(cutoff)).agg(
        F.count(F.when(purged, 1)).alias("n_users_purged"),
        F.coalesce(F.sum(F.when(purged, F.col("n_events"))), F.lit(0))
        .cast("long")
        .alias("n_events_purged"),
        F.count(F.when(~purged, 1)).alias("n_users_kept"),
        F.coalesce(F.sum(F.when(~purged, F.col("n_events"))), F.lit(0))
        .cast("long")
        .alias("n_events_kept"),
    )


@register(
    "pii_vault_tokenize",
    oracle="""
    WITH vault AS (
      SELECT c_name,
             'tok_' || substr(md5('vault|' || c_name), 1, 16) AS token
      FROM (SELECT DISTINCT c_name FROM customer)
    ),
    tokenized AS (
      SELECT c.c_custkey, v.token, c.c_acctbal
      FROM customer c JOIN vault v ON v.c_name = c.c_name
    ),
    detok AS (
      SELECT t.c_custkey, v.c_name, t.c_acctbal
      FROM tokenized t JOIN vault v ON v.token = t.token
    )
    SELECT d.c_custkey, d.c_name,
           CASE WHEN d.c_name = c.c_name THEN 1 ELSE 0 END AS roundtrip_ok
    FROM detok d JOIN customer c ON c.c_custkey = d.c_custkey
    WHERE d.c_custkey % 50 = 0
    """,
)
def pii_vault_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenization-vault PII protection: replace each name with an
    opaque surrogate token via a VAULT table (distinct value → token),
    hand the tokenized table to analytics, and restore the original only
    by re-joining the vault — the architecture where raw PII lives in
    exactly one access-controlled table and everything downstream is
    pseudonymous (contrast pii_hash: one-way, no restore;
    pii_encrypt_roundtrip: key-based, value leaves with the data).  The
    op runs the FULL cycle and proves per-row restoration
    (roundtrip_ok).

    The derivation here is a keyed digest for determinism; a production
    vault issues random tokens — same plan, different generator —
    making the vault table itself the only de-anonymization path.

    Scale (100 TB): the vault is |distinct values| rows (broadcast when
    small, shuffled join otherwise); tokenize and detokenize are each
    ONE equi join; analytics never touch the raw column.  Vault writes
    are append-only upserts (merge_upsert's shape) as new values
    arrive."""
    c = load(spark, sf_dir, "customer")
    vault = c.select("c_name").distinct().select(
        "c_name",
        F.concat(
            F.lit("tok_"),
            F.substring(F.md5(F.concat(F.lit("vault|"), F.col("c_name"))), 1, 16),
        ).alias("token"),
    )
    tokenized = c.join(F.broadcast(vault), "c_name").select(
        "c_custkey", "token", "c_acctbal"
    )
    detok = tokenized.join(
        F.broadcast(vault.select("token", F.col("c_name").alias("restored"))),
        "token",
    ).select("c_custkey", F.col("restored").alias("c_name"), "c_acctbal")
    orig = c.select("c_custkey", F.col("c_name").alias("orig_name"))
    return (
        detok.join(orig, "c_custkey")
        .filter(F.col("c_custkey") % 50 == 0)
        .select(
            "c_custkey",
            "c_name",
            F.when(F.col("c_name") == F.col("orig_name"), 1)
            .otherwise(0)
            .alias("roundtrip_ok"),
        )
    )


@register(
    "pii_phone_normalize",
    oracle="""
    WITH raw AS (
      SELECT c_custkey,
             CASE c_custkey % 4
               WHEN 0 THEN '(' || lpad(CAST(200 + c_custkey % 700 AS VARCHAR), 3, '0')
                         || ') ' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
                         || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
               WHEN 1 THEN lpad(CAST(200 + c_custkey % 700 AS VARCHAR), 3, '0')
                         || '.' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
                         || '.' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
               WHEN 2 THEN '+1 ' || lpad(CAST(200 + c_custkey % 700 AS VARCHAR), 3, '0')
                         || ' ' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
                         || ' ' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
               ELSE '1-' || lpad(CAST(200 + c_custkey % 700 AS VARCHAR), 3, '0')
                         || '-' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
                         || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
             END AS phone
      FROM customer
    ),
    norm AS (
      SELECT c_custkey, phone,
             regexp_replace(phone, '[^0-9]', '', 'g') AS digits
      FROM raw
    )
    SELECT c_custkey,
           '+1' || CASE WHEN length(digits) = 11 THEN substr(digits, 2)
                        ELSE digits END AS e164
    FROM norm
    WHERE c_custkey % 40 = 0
    """,
)
def pii_phone_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phone normalization to E.164: four wild input formats —
    '(213) 555-0100', '213.555.0100', '+1 213 555 0100', '1-213-555-0100'
    — all canonicalize to '+12135550100' by stripping non-digits and
    absorbing the country prefix.  This is entity-resolution
    plumbing: pii_hash/pii_vault_tokenize key on the NORMALIZED value,
    otherwise the same person splits into four identities (formats are
    synthesized per customer; the fixture has no phone column).

    Scale (100 TB): pure codegen string projection — the character-class
    strip cannot backtrack, the prefix rule is a length CASE, no UDF.
    The %40 output filter pushes to the scan."""
    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    npa = F.lpad((200 + k % 700).cast("string"), 3, "0")
    nxx = F.lpad((k % 1000).cast("string"), 3, "0")
    line = F.lpad((k % 10000).cast("string"), 4, "0")
    phone = (
        F.when(k % 4 == 0, F.concat(F.lit("("), npa, F.lit(") "), nxx, F.lit("-"), line))
        .when(k % 4 == 1, F.concat(npa, F.lit("."), nxx, F.lit("."), line))
        .when(k % 4 == 2, F.concat(F.lit("+1 "), npa, F.lit(" "), nxx, F.lit(" "), line))
        .otherwise(F.concat(F.lit("1-"), npa, F.lit("-"), nxx, F.lit("-"), line))
    )
    digits = F.regexp_replace(phone, "[^0-9]", "")
    e164 = F.concat(
        F.lit("+1"),
        F.when(F.length(digits) == 11, F.substring(digits, 2, 15)).otherwise(
            digits
        ),
    )
    return c.filter(k % 40 == 0).select("c_custkey", e164.alias("e164"))


@register(
    "pii_consent_filter",
    oracle="""
    WITH optout AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % 17 = 0
    )
    SELECT e.event_type,
           COUNT(*) AS n_kept,
           (SELECT COUNT(*) FROM events e2
             WHERE e2.event_type = e.event_type
               AND e2.user_id % 17 = 0) AS n_dropped
    FROM events e
    WHERE NOT EXISTS (SELECT 1 FROM optout o WHERE o.user_id = e.user_id)
    GROUP BY e.event_type
    """,
)
def pii_consent_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consent enforcement: remove every event belonging to an opted-out
    user (the consent registry is simulated as user_id % 17 — in
    production it is its own small table) and account for what was
    dropped per event type — the audit trail a DPO asks for.  The
    registry applies as a LEFT ANTI join, the only correct shape:
    filtering by `user_id NOT IN (subquery)` breaks on NULLs and
    re-evaluates the subquery per partition in naive engines.

    Scale (100 TB): the opt-out registry is tiny by nature → broadcast
    anti join, zero shuffle of the fact table; the drop accounting
    reuses the same registry for a conditional count.  Enforcement
    belongs at INGEST so downstream tables never hold the data —
    pii_retention_sweep handles the time-based sibling."""
    ev = load(spark, sf_dir, "events")
    optout = ev.filter(F.col("user_id") % 17 == 0).select("user_id").distinct()
    kept = ev.join(F.broadcast(optout), "user_id", "left_anti")
    dropped = (
        ev.filter(F.col("user_id") % 17 == 0)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    return (
        kept.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        # LEFT join + 0-fill: an event type with nothing dropped must still
        # report n_dropped = 0, not vanish from the audit (degenerate-sweep
        # find: an inner join here loses every fully-consented type)
        .join(dropped, "event_type", "left")
        .select(
            "event_type",
            "n_kept",
            F.coalesce("n_dropped", F.lit(0).cast("long")).alias("n_dropped"),
        )
    )


@register(
    "pii_email_normalize",
    oracle="""
    WITH raw AS (
      SELECT c_custkey,
             replace(c_name, '#', '.')
               || CASE WHEN c_custkey % 3 = 0 THEN '+Promo' ELSE '' END
               || '@'
               || CASE WHEN c_custkey % 2 = 0 THEN 'GoogleMail.com'
                       ELSE 'Example.COM' END AS raw_email
      FROM customer WHERE c_custkey % 10 = 0
    ),
    parts AS (
      SELECT c_custkey, raw_email,
             split_part(lower(split_part(raw_email, '@', 1)), '+', 1)
               AS local,
             lower(split_part(raw_email, '@', 2)) AS domain
      FROM raw
    )
    SELECT c_custkey, raw_email,
           CASE WHEN domain IN ('gmail.com', 'googlemail.com')
                THEN replace(local, '.', '') || '@gmail.com'
                ELSE local || '@' || domain END AS norm_email,
           CASE WHEN domain IN ('gmail.com', 'googlemail.com')
                THEN 1 ELSE 0 END AS is_gmail_family
    FROM parts
    """,
)
def pii_email_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email canonicalization for identity resolution — the join-key
    cleaner that lets pii_hash / join_record_linkage_scored match the
    SAME person across 'J.Doe+promo@GoogleMail.com' and
    'jdoe@gmail.com': case-fold, strip +tag subaddresses, collapse
    dots and unify domain aliases for the gmail family, preserve dots
    for everyone else (dots are significant at most providers).
    Fixture emails synthesize deterministically from c_name/custkey
    with mixed case, dotted locals, periodic +tags and alternating
    domains, so every rule exercises both branches.  Completes the
    normalizer set next to pii_phone_normalize.

    Scale (100 TB): pure string projection, no shuffle; the
    normalized address is what gets hashed/bucketed downstream, so
    this runs inside the scan stage of any PII pipeline."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    raw_email = F.concat(
        F.regexp_replace("c_name", "#", "."),
        F.when(F.col("c_custkey") % 3 == 0, F.lit("+Promo")).otherwise(
            F.lit("")
        ),
        F.lit("@"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit("GoogleMail.com")).otherwise(
            F.lit("Example.COM")
        ),
    )
    raw = c.select("c_custkey", raw_email.alias("raw_email"))
    local = F.substring_index(
        F.lower(F.substring_index("raw_email", "@", 1)), "+", 1
    )
    domain = F.lower(F.substring_index("raw_email", "@", -1))
    parts = raw.select(
        "c_custkey", "raw_email", local.alias("local"), domain.alias("domain")
    )
    is_gmail = F.col("domain").isin("gmail.com", "googlemail.com")
    return parts.select(
        "c_custkey",
        "raw_email",
        F.when(
            is_gmail,
            F.concat(
                F.regexp_replace("local", "\\.", ""), F.lit("@gmail.com")
            ),
        )
        .otherwise(F.concat(F.col("local"), F.lit("@"), F.col("domain")))
        .alias("norm_email"),
        F.when(is_gmail, 1).otherwise(0).alias("is_gmail_family"),
    )


@register(
    "pii_kanon_generalize",
    oracle="""
    WITH base AS (
      SELECT c_mktsegment AS seg,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) * 1000 AS bal_bucket
      FROM customer
    ),
    g0 AS (
      SELECT seg, bal_bucket, COUNT(*) AS n
      FROM base GROUP BY seg, bal_bucket
    ),
    keep0 AS (
      SELECT seg, CAST(bal_bucket AS VARCHAR) AS bucket_out, n
      FROM g0 WHERE n >= 5
    ),
    rest1 AS (
      SELECT seg, CAST(SUM(n) AS BIGINT) AS n
      FROM g0 WHERE n < 5 GROUP BY seg
    ),
    keep1 AS (
      SELECT seg, '*' AS bucket_out, n FROM rest1 WHERE n >= 5
    ),
    rest2 AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n FROM rest1 WHERE n < 5
    ),
    keep2 AS (
      SELECT '*' AS seg, '*' AS bucket_out, n FROM rest2 WHERE n > 0
    ),
    unioned AS (
      SELECT seg, bucket_out, n FROM keep0
      UNION ALL SELECT seg, bucket_out, n FROM keep1
      UNION ALL SELECT seg, bucket_out, n FROM keep2
    )
    SELECT seg, bucket_out, n,
           CASE WHEN n >= 5 THEN 1 ELSE 0 END AS k_ok
    FROM unioned
    """,
)
def pii_kanon_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity GENERALIZATION (k=5): pii_kanon_check reports which
    quasi-identifier groups are too small to publish; this op FIXES
    them by deterministic local recoding — (segment, $1000 balance
    band) groups of n≥5 publish as-is, under-k groups coarsen the
    balance band to '*', still-under-k segments collapse fully to
    ('*','*') — the release-ready generalization ladder every
    privacy review asks for, as a two-level hierarchy walk with no
    iteration.  The residual ('*','*') cell can stay under k only if
    the whole under-k population is smaller than k (flagged k_ok=0
    for the suppression decision).

    Scale (100 TB): three map-side-combined aggregates over
    monotonically shrinking remainders; the generalization never
    touches row payloads, only group keys, so it composes with
    pii_pipeline's column transforms."""
    c = load(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_mktsegment").alias("seg"),
        (F.floor(F.col("c_acctbal") / 1000).cast("long") * 1000).alias(
            "bal_bucket"
        ),
    )
    g0 = base.groupBy("seg", "bal_bucket").agg(F.count(F.lit(1)).alias("n"))
    keep0 = g0.filter(F.col("n") >= 5).select(
        "seg", F.col("bal_bucket").cast("string").alias("bucket_out"), "n"
    )
    rest1 = (
        g0.filter(F.col("n") < 5)
        .groupBy("seg")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    keep1 = rest1.filter(F.col("n") >= 5).select(
        "seg", F.lit("*").alias("bucket_out"), "n"
    )
    rest2 = rest1.filter(F.col("n") < 5).agg(
        F.sum("n").cast("long").alias("n")
    )
    keep2 = rest2.filter(F.col("n") > 0).select(
        F.lit("*").alias("seg"), F.lit("*").alias("bucket_out"), "n"
    )
    unioned = keep0.unionAll(keep1).unionAll(keep2)
    return unioned.select(
        "seg",
        "bucket_out",
        "n",
        F.when(F.col("n") >= 5, 1).otherwise(0).alias("k_ok"),
    )


@register(
    "pii_hash_join_integrity",
    oracle="""
    WITH raw_join AS (
      SELECT c.c_mktsegment AS segment, COUNT(*) AS n_orders,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 1000000) AS BIGINT))
               AS BIGINT) AS rev6
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
    ),
    pseudo_join AS (
      SELECT c.c_mktsegment AS segment, COUNT(*) AS n_orders,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 1000000) AS BIGINT))
               AS BIGINT) AS rev6
      FROM (SELECT sha256('k|' || o_custkey) AS ck, o_totalprice
            FROM orders) o
      JOIN (SELECT sha256('k|' || c_custkey) AS ck, c_mktsegment
            FROM customer) c
        ON o.ck = c.ck
      GROUP BY c.c_mktsegment
    )
    SELECT r.segment, r.n_orders AS n_orders_raw,
           p.n_orders AS n_orders_pseudo,
           CASE WHEN r.n_orders = p.n_orders AND r.rev6 = p.rev6
                THEN 1 ELSE 0 END AS integrity_ok
    FROM raw_join r JOIN pseudo_join p ON r.segment = p.segment
    """,
)
def pii_hash_join_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymization join-integrity proof: the orders⋈customer
    rollup computed twice — once on raw keys, once after BOTH sides'
    keys pass through the salted sha256 pii_hash applies — and
    compared cell by cell.  This is the acceptance test every privacy
    review wants before swapping raw identifiers out of a warehouse:
    pseudonymized keys must preserve JOIN SEMANTICS exactly (equal
    row counts AND equal revenue per segment), which holds iff the
    hash is applied with the same salt on both sides and the key
    domain is collision-free at corpus size.

    Scale (100 TB): runs the same join twice (hashed keys shuffle
    32-byte digests instead of longs — the pii_hash cost model);
    the comparison is a |segments|-row join."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    r6 = fp_scaled_long(F.col("o_totalprice"), 1_000_000)
    raw = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            # 5 global segments over every order — hi/lo split; the
            # integrity compare below tests decimal == decimal exactly
            F.count(F.lit(1)).alias("n_orders_raw"),
            fp_split_sum_of(r6).alias("rev6_raw"),
        )
    )
    ohash = o.select(
        F.sha2(F.concat(F.lit("k|"), F.col("o_custkey").cast("string")), 256).alias(
            "ck"
        ),
        "o_totalprice",
    )
    chash = c.select(
        F.sha2(F.concat(F.lit("k|"), F.col("c_custkey").cast("string")), 256).alias(
            "ck"
        ),
        "c_mktsegment",
    )
    pseudo = (
        ohash.join(chash, "ck")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders_pseudo"),
            fp_split_sum_of(r6).alias("rev6_pseudo"),
        )
    )
    return raw.join(pseudo, "segment").select(
        "segment",
        "n_orders_raw",
        "n_orders_pseudo",
        F.when(
            (F.col("n_orders_raw") == F.col("n_orders_pseudo"))
            & (F.col("rev6_raw") == F.col("rev6_pseudo")),
            1,
        )
        .otherwise(0)
        .alias("integrity_ok"),
    )


@register(
    "pii_subject_access_export",
    oracle="""
    WITH subjects AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 500 = 0
    ),
    ord AS (
      SELECT o.o_custkey AS c_custkey,
             CAST(COUNT(*) AS BIGINT) AS n_records,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents,
             strftime(MIN(o.o_orderdate), '%Y-%m-%d') AS first_seen,
             strftime(MAX(o.o_orderdate), '%Y-%m-%d') AS last_seen
      FROM orders o JOIN subjects s ON s.c_custkey = o.o_custkey
      GROUP BY 1
    ),
    li AS (
      SELECT o.o_custkey AS c_custkey,
             CAST(COUNT(*) AS BIGINT) AS n_records,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents,
             strftime(MIN(l.l_shipdate), '%Y-%m-%d') AS first_seen,
             strftime(MAX(l.l_shipdate), '%Y-%m-%d') AS last_seen
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN subjects s ON s.c_custkey = o.o_custkey
      GROUP BY 1
    )
    SELECT c_custkey, 'orders' AS source_table, n_records, cents,
           first_seen, last_seen
    FROM ord
    UNION ALL
    SELECT c_custkey, 'lineitem', n_records, cents, first_seen, last_seen
    FROM li
    """,
)
def pii_subject_access_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR/CCPA subject-access export manifest: for each data subject
    in scope, one row per table holding their data with record count,
    money total, and first/last activity dates — the inventory a DSAR
    response starts from and the complement of pii_retention_sweep
    (which deletes) and pii_consent_filter (which gates).  Every
    per-table extract hangs off the SAME broadcast subject list, so
    adding a table is adding one branch, and dates export as ISO
    strings (the engines' native date-to-string defaults differ).

    Scale (100 TB): the subject list broadcasts to every fact scan
    (semi-join pushdown — facts never shuffle on the full key space,
    only matching rows aggregate), and each branch map-side combines
    to |subjects| rows."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    subjects = c.filter(F.col("c_custkey") % 500 == 0).select("c_custkey")
    ocents = (
        F.signum("o_totalprice") * ((F.abs(F.col("o_totalprice")) * 100 + 0.5).cast("long"))
    ).cast("long")
    lcents = (
        F.signum("l_extendedprice") * ((F.abs(F.col("l_extendedprice")) * 100 + 0.5).cast("long"))
    ).cast("long")
    ord_x = (
        o.join(F.broadcast(subjects), o.o_custkey == subjects.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.sum(ocents).cast("long").alias("cents"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_seen"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_seen"),
        )
        .select(
            "c_custkey",
            F.lit("orders").alias("source_table"),
            "n_records",
            "cents",
            "first_seen",
            "last_seen",
        )
    )
    li_x = (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(subjects), F.col("o_custkey") == subjects.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.sum(lcents).cast("long").alias("cents"),
            F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("first_seen"),
            F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("last_seen"),
        )
        .select(
            "c_custkey",
            F.lit("lineitem").alias("source_table"),
            "n_records",
            "cents",
            "first_seen",
            "last_seen",
        )
    )
    return ord_x.unionAll(li_x)


@register(
    "pii_small_cell_suppress",
    oracle="""
    WITH cells AS (
      SELECT n.n_name, c.c_mktsegment AS segment,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ),
    kept AS (
      SELECT n_name, segment, n, CAST(0 AS BIGINT) AS n_merged_cells
      FROM cells WHERE n >= 10
    ),
    merged AS (
      SELECT n_name, 'OTHER' AS segment, CAST(SUM(n) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_merged_cells
      FROM cells WHERE n < 10 GROUP BY n_name
    )
    SELECT * FROM kept UNION ALL SELECT * FROM merged
    """,
)
def pii_small_cell_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-cell suppression for published aggregates: nation ×
    segment customer counts where any cell under k=10 is merged into
    a per-nation OTHER row (with the merged-cell count disclosed) —
    the statistical-disclosure-control step census bureaus and health
    agencies mandate before releasing cross-tabs, complementing
    pii_kanon_check (which detects risky cells) and
    pii_kanon_generalize (which coarsens quasi-identifiers) by
    actually producing the publishable table.

    Scale (100 TB): one map-side-combined cross-tab, split by a
    threshold predicate into pass-through and per-group re-merge —
    both on the bounded cell axis, facts scanned once."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    cells = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    kept = cells.filter(F.col("n") >= 10).select(
        "n_name", "segment", "n", F.lit(0).cast("long").alias("n_merged_cells")
    )
    merged = (
        cells.filter(F.col("n") < 10)
        .groupBy("n_name")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_merged_cells"),
        )
        .select(
            "n_name", F.lit("OTHER").alias("segment"), "n", "n_merged_cells"
        )
    )
    return kept.unionAll(merged)


@register(
    "pii_date_shift_consistent",
    oracle="""
    SELECT event_id, user_id,
           CAST((user_id * 2654435761) % 29 - 14 AS BIGINT) AS shift_days,
           CAST(date_trunc('day', ts) AS DATE) AS orig_d,
           CAST(date_trunc('day', ts)
                + CAST((user_id * 2654435761) % 29 - 14 AS INTEGER) AS DATE)
             AS shifted_d
    FROM events
    """,
)
def pii_date_shift_consistent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent per-subject date shifting — the standard clinical /
    research de-identification move: every record of a user moves by the
    SAME deterministic offset in [-14, +14] (Knuth multiplicative hash of
    the subject id), so within-user intervals, orderings, and
    day-of-study analyses survive while absolute dates are useless to a
    re-identifier.  user_id·2654435761 stays far inside BIGINT and the
    mod/offset arithmetic is integer-exact in both engines; DATE + int
    days stays DATE (the DuckDB DATE+INTERVAL→TIMESTAMP trap avoided).

    Scale (100 TB): a pure narrow projection — no shuffle, no lookup
    table to secure (vs a random-offset vault), safe under retries
    because the shift is a function of the key."""
    e = load(spark, sf_dir, "events")
    shift = (F.col("user_id") * F.lit(2654435761)) % 29 - 14
    orig_d = F.date_trunc("day", "ts").cast("date")
    return e.select(
        "event_id", "user_id",
        shift.cast("long").alias("shift_days"),
        orig_d.alias("orig_d"),
        F.date_add(orig_d, shift.cast("int")).alias("shifted_d"),
    )


@register(
    "pii_generalize_timestamp",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type, ts,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_key,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_key
      FROM events
    ),
    hc AS (
      SELECT event_type, hour_key, COUNT(*) AS n FROM base GROUP BY 1, 2
    ),
    dc AS (
      SELECT event_type, day_key, COUNT(*) AS n FROM base GROUP BY 1, 2
    )
    SELECT b.event_id, b.event_type,
           CASE WHEN hc.n >= 5 THEN 'hour'
                WHEN dc.n >= 5 THEN 'day'
                ELSE 'suppressed' END AS granularity,
           CASE WHEN hc.n >= 5 THEN b.hour_key
                WHEN dc.n >= 5 THEN b.day_key
                ELSE NULL END AS gen_ts
    FROM base b
    JOIN hc ON hc.event_type = b.event_type AND hc.hour_key = b.hour_key
    JOIN dc ON dc.event_type = b.event_type AND dc.day_key = b.day_key
    """,
)
def pii_generalize_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymous timestamp generalization (k=5): each event's time is
    published at the finest granularity whose (event_type, bucket) group
    still holds ≥ k events — hour if the hourly cell is big enough, else
    day, else suppressed — the generalization-ladder pattern of
    k-anonymity applied to the time dimension (pii_kanon_generalize holds
    the categorical version).  Group sizes come from two aggregates
    joined back on the bucket keys; the ladder CASE is identical text in
    both engines, and generalized values are pre-formatted strings so the
    output type is uniform across rungs.

    Scale (100 TB): two map-side-combined counts on bounded bucket grids
    plus two broadcast-able joins back; no per-row state.  The k
    threshold and ladder ([hour, day, suppress]) are policy knobs."""
    e = load(spark, sf_dir, "events")
    base = e.select(
        "event_id", "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour_key"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day_key"),
    )
    hc = base.groupBy("event_type", "hour_key").agg(F.count(F.lit(1)).alias("hn"))
    dc = base.groupBy("event_type", "day_key").agg(F.count(F.lit(1)).alias("dn"))
    j = base.join(hc, ["event_type", "hour_key"]).join(dc, ["event_type", "day_key"])
    return j.select(
        "event_id", "event_type",
        F.when(F.col("hn") >= 5, "hour")
        .when(F.col("dn") >= 5, "day")
        .otherwise("suppressed")
        .alias("granularity"),
        F.when(F.col("hn") >= 5, F.col("hour_key"))
        .when(F.col("dn") >= 5, F.col("day_key"))
        .otherwise(F.lit(None).cast("string"))
        .alias("gen_ts"),
    )


@register(
    "pii_l_diversity_check",
    oracle="""
    WITH cells AS (
      SELECT c_nationkey,
             CAST(FLOOR(c_acctbal / 2000) AS INTEGER) AS bal_bucket,
             CAST(COUNT(*) AS BIGINT) AS group_size,
             CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_distinct
      FROM customer
      GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN l_distinct < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_l2,
           CAST(SUM(CASE WHEN l_distinct < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_l3,
           CAST(SUM(CASE WHEN l_distinct < 2 THEN group_size ELSE 0 END)
                AS BIGINT) AS rows_exposed_l2,
           round(CAST(SUM(CASE WHEN l_distinct < 2 THEN group_size ELSE 0 END)
                      AS BIGINT) / CAST(SUM(group_size) AS DOUBLE), 6)
             AS exposure_rate_l2,
           CAST(MIN(l_distinct) AS BIGINT) AS min_l
    FROM cells
    """,
)
def pii_l_diversity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: within each quasi-identifier group (nation ×
    account-balance bucket), how many DISTINCT values of the sensitive
    attribute (market segment) appear — k-anonymity (pii_kanon_check)
    stops homogeneity attacks only if every group is also l-diverse; a
    group of 40 indistinguishable people who ALL share one segment
    leaks the segment despite k=40.  Reports groups below l=2 and l=3,
    the rows exposed, and the worst group.  Bucket boundaries use
    explicit FLOOR (the DuckDB-rounds/Spark-truncates cast trap).

    Scale (100 TB): one (QI-group) aggregate with a distinct count —
    the same shape as the k-anonymity check, combinable map-side."""
    c = load(spark, sf_dir, "customer")
    cells = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 2000).cast("int").alias("bal_bucket"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.countDistinct("c_mktsegment").cast("long").alias("l_distinct"),
    )
    return cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("l_distinct") < 2, 1).otherwise(0))
        .cast("long")
        .alias("groups_below_l2"),
        F.sum(F.when(F.col("l_distinct") < 3, 1).otherwise(0))
        .cast("long")
        .alias("groups_below_l3"),
        F.sum(F.when(F.col("l_distinct") < 2, F.col("group_size")).otherwise(0))
        .cast("long")
        .alias("rows_exposed_l2"),
        F.round(
            F.sum(
                F.when(F.col("l_distinct") < 2, F.col("group_size")).otherwise(0)
            ).cast("long")
            / F.sum("group_size").cast("double"),
            6,
        ).alias("exposure_rate_l2"),
        F.min("l_distinct").cast("long").alias("min_l"),
    )


@register(
    "pii_kanon_utility_curve",
    oracle="""
    WITH cells AS (
      SELECT c_nationkey,
             CAST(FLOOR(c_acctbal / 1000) AS INTEGER) AS bal_bucket,
             CAST(COUNT(*) AS BIGINT) AS group_size
      FROM customer
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(SUM(group_size) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_groups
      FROM cells
    ),
    ks AS (SELECT unnest([2, 3, 5, 10]) AS k)
    SELECT ks.k,
           CAST(SUM(CASE WHEN c.group_size < ks.k THEN 1 ELSE 0 END)
                AS BIGINT) AS groups_suppressed,
           CAST(SUM(CASE WHEN c.group_size < ks.k THEN c.group_size ELSE 0 END)
                AS BIGINT) AS rows_suppressed,
           round(CAST(SUM(CASE WHEN c.group_size >= ks.k
                          THEN c.group_size ELSE 0 END) AS BIGINT)
                 / CAST(MAX(t.n_rows) AS DOUBLE), 6) AS utility_retained,
           round(CAST(SUM(CASE WHEN c.group_size >= ks.k THEN 1 ELSE 0 END)
                      AS BIGINT) / CAST(MAX(t.n_groups) AS DOUBLE), 6)
             AS group_coverage
    FROM cells c CROSS JOIN tot t CROSS JOIN ks
    GROUP BY ks.k
    """,
)
def pii_kanon_utility_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The privacy-utility frontier of small-cell suppression: at each
    candidate k ∈ {2,3,5,10}, how many quasi-identifier groups and rows
    would k-anonymity suppression delete and what fraction of the data
    survives — the curve a privacy officer and an analyst negotiate
    over BEFORE fixing k (pii_small_cell_suppress applies one k; this
    op prices all of them).  Exact counts throughout; the k grid is a
    4-row broadcast cross join.

    Scale (100 TB): one QI-group size aggregate reused across every k —
    the frontier costs no more than a single suppression pass."""
    c = load(spark, sf_dir, "customer")
    cells = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_bucket"),
    ).agg(F.count(F.lit(1)).cast("long").alias("group_size"))
    tot = cells.agg(
        F.sum("group_size").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
    )
    ks = c.sparkSession.createDataFrame([(2,), (3,), (5,), (10,)], "k int")
    j = cells.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(ks))
    small = F.col("group_size") < F.col("k")
    return j.groupBy("k").agg(
        F.sum(F.when(small, 1).otherwise(0)).cast("long").alias("groups_suppressed"),
        F.sum(F.when(small, F.col("group_size")).otherwise(0))
        .cast("long")
        .alias("rows_suppressed"),
        F.round(
            F.sum(F.when(~small, F.col("group_size")).otherwise(0)).cast("long")
            / F.max("n_rows").cast("double"),
            6,
        ).alias("utility_retained"),
        F.round(
            F.sum(F.when(~small, 1).otherwise(0)).cast("long")
            / F.max("n_groups").cast("double"),
            6,
        ).alias("group_coverage"),
    )
