"""Category H — scalar function families (SURVEY.md §2.H).

One query per family, projected over a stable unique key so the driver's
value-hash pins every value.  All expressions are JVM-side Catalyst
expressions (whole-stage codegen; no Python in the loop).

Dialect notes baked in (probed this session):
- transcendentals (pow/exp/ln/log10) round(6) both sides — libm vs Java
  Math can differ in the last ulp; sqrt is IEEE-correctly-rounded → raw.
- float→int conversions via FLOOR (Spark CAST truncates, DuckDB rounds).
- Spark ``weekday(d)+1`` ≡ DuckDB ``isodow(d)`` (SURVEY §2.H [verified]).
- DuckDB list_distinct does NOT preserve order → sort both sides.
- DuckDB map[key] yields a 1-element list → ``[1]`` to get the scalar.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..exprs import fp_scaled_long
from ..registry import register
from ..tables import load


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS up_name,
           lower(c_mktsegment) AS low_seg,
           trim(' ' || c_name || '  ') AS trimmed,
           substring(c_name, 1, 8) AS name8,
           concat_ws('-', c_mktsegment, c_name) AS seg_name,
           length(c_name) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_padded,
           replace(c_name, 'Customer', 'Cust') AS renamed,
           strpos(c_name, '#') AS hash_pos,
           string_split(c_name, '#')[1] AS name_prefix,
           reverse(c_name) AS name_rev
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("low_seg"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.substring("c_name", 1, 8).alias("name8"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("renamed"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.element_at(F.split("c_name", "#"), 1).alias("name_prefix"),
        F.reverse(F.col("c_name")).alias("name_rev"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS d,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           isodow(CAST(o_orderdate AS DATE)) AS dow_iso,
           CAST(o_orderdate AS DATE) + 30 AS d_plus30,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           make_date(year(o_orderdate), month(o_orderdate), 1) AS made
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("d"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        (F.weekday(d) + 1).alias("dow_iso"),
        F.date_add(d, 30).alias("d_plus30"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)).alias(
            "made"
        ),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / 7.0, 2) AS r2,
           CAST(FLOOR(l_extendedprice / 100.0) AS BIGINT) AS flr,
           CAST(CEIL(l_discount * 100.0) AS BIGINT) AS cl,
           abs(l_extendedprice - 30000.0) AS ab,
           round(pow(l_quantity, 2.0), 6) AS pw,
           CASE WHEN l_extendedprice >= 0
                THEN sqrt(l_extendedprice) END AS sq,
           round(exp(l_discount), 6) AS ex,
           CASE WHEN l_extendedprice > 0
                THEN round(ln(l_extendedprice), 6) END AS l1,
           CASE WHEN l_extendedprice > 0
                THEN round(log10(l_extendedprice), 6) END AS l10,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
           l_orderkey % 7 AS pm,
           greatest(l_quantity, l_tax * 100.0) AS gr,
           least(l_quantity, l_tax * 100.0) AS ls
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice") / 7.0, 2).alias("r2"),
        F.floor(F.col("l_extendedprice") / 100.0).alias("flr"),
        F.ceil(F.col("l_discount") * 100.0).alias("cl"),
        F.abs(F.col("l_extendedprice") - 30000.0).alias("ab"),
        F.round(F.pow("l_quantity", F.lit(2.0)), 6).alias("pw"),
        # domain guards (extreme regime): sqrt/ln of a negative price is
        # NaN-in-Spark but a hard ERROR in DuckDB — NULL on both sides
        F.when(
            F.col("l_extendedprice") >= 0, F.sqrt("l_extendedprice")
        ).alias("sq"),
        F.round(F.exp("l_discount"), 6).alias("ex"),
        F.when(
            F.col("l_extendedprice") > 0,
            F.round(F.log("l_extendedprice"), 6),
        ).alias("l1"),
        F.when(
            F.col("l_extendedprice") > 0,
            F.round(F.log10("l_extendedprice"), 6),
        ).alias("l10"),
        F.signum(F.col("l_discount") - 0.05).alias("sg"),
        F.pmod("l_orderkey", F.lit(7)).alias("pm"),
        F.greatest(F.col("l_quantity"), F.col("l_tax") * 100.0).alias("gr"),
        F.least(F.col("l_quantity"), F.col("l_tax") * 100.0).alias("ls"),
    )


@register(
    "fn_cond",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_class,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
           nullif(o_orderpriority, '5-LOW') AS prio_nz,
           CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END AS f_price
    FROM orders
    """,
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.nullif("o_orderpriority", F.lit("5-LOW")).alias("prio_nz"),
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
        .otherwise(F.lit(0.0))
        .alias("f_price"),
    )


@register(
    "fn_cast",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(strftime(l_shipdate, '%Y-%m-%d') AS DATE) AS ship_d,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_s,
           CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS VARCHAR) AS price_str,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST('00042' AS INTEGER) AS int_from_str,
           CAST(CAST(l_quantity AS DECIMAL(18,4)) AS DOUBLE) AS qty_dec
    FROM lineitem
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast chains: timestamp→string→date, double→decimal(18,4)→string
    (both engines render the full scale, probed: '1.5000'), int↔string.

    qty_dec exercises the decimal(18,4) cast but is PROJECTED back to
    double on both sides: the driver hashes pandas frames, where a Spark
    decimal survives as a Decimal object while DuckDB DECIMAL collapses to
    float64 — an unavoidable hash mismatch (r03 driver FAIL, fixed here).
    The decimal→string rendering stays covered by price_str."""
    li = load(spark, sf_dir, "lineitem")
    ship_s = F.date_format("l_shipdate", "yyyy-MM-dd")
    return li.select(
        "l_orderkey", "l_linenumber",
        ship_s.cast("date").alias("ship_d"),
        ship_s.alias("ship_s"),
        F.col("l_extendedprice").cast("decimal(18,4)").cast("string").alias("price_str"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.lit("00042").cast("int").alias("int_from_str"),
        F.col("l_quantity").cast("decimal(18,4)").cast("double").alias("qty_dec"),
    )


@register(
    "fn_array",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tok,
           list_contains(toks, 'spark') AS has_spark,
           array_to_string(list_slice(toks, 1, 3), ' ') AS first3,
           toks[2] AS tok2,
           array_to_string(list_sort(list_distinct(toks)), ' ') AS vocab,
           array_to_string(
               flatten([list_slice(toks, 1, 2), list_slice(toks, 3, 4)]), ' '
           ) AS first4
    FROM t
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over tokenized documents.  list_distinct order is
    engine-specific → wrapped in sort on both sides.  Array-typed outputs
    are projected to space-joined strings (same witness both sides): the
    driver's pandas canonicalizer cannot hash list cells (SURVEY §7.5,
    r02 VERDICT item 1) — the array *operations* still run JVM-side, only
    the final projection is scalar."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        # try_element_at (hostile-strings sweep): a 1-token doc (empty
        # text splits to ['']) must yield NULL like DuckDB's toks[2],
        # not ANSI INVALID_ARRAY_INDEX
        F.try_element_at(toks, F.lit(2)).alias("tok2"),
        F.array_join(F.array_sort(F.array_distinct(toks)), " ").alias("vocab"),
        F.array_join(
            F.flatten(F.array(F.slice(toks, 1, 2), F.slice(toks, 3, 2))), " "
        ).alias("first4"),
    )


@register(
    "fn_explode",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
               WHERE doc_id < 100)
    SELECT doc_id,
           unnest(range(1, len(toks) + 1)) AS pos1,
           unnest(toks) AS tok
    FROM t
    """,
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (UDTF-shaped lateral): one row per token with 1-based
    ordinality.  DuckDB zips parallel unnests (probed this session)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos1"), "tok")


@register(
    "fn_map",
    oracle="""
    WITH t AS (SELECT event_id, MAP {'u': user_id, 'e': event_id * 10} AS m
               FROM events)
    SELECT event_id,
           m['u'][1] AS u_val,
           m['e'][1] AS e_val,
           array_to_string(list_sort(map_keys(m)), ' ') AS keys_sorted,
           array_to_string(list_sort(map_values(m)), ' ') AS vals_sorted
    FROM t
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: build, extract, keys/values.  Outputs are projected to
    scalars / space-joined sorted lists — map *rendering* differs between
    engines, element semantics don't (SURVEY §7.4.5), and the driver's
    canonicalizer can't hash list cells (r02 VERDICT item 1)."""
    ev = load(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("u"), F.lit("e")),
        F.array(F.col("user_id"), F.col("event_id") * 10),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "u").alias("u_val"),
        F.element_at(m, "e").alias("e_val"),
        F.array_join(F.array_sort(F.map_keys(m)), " ").alias("keys_sorted"),
        F.array_join(
            F.transform(F.array_sort(F.map_values(m)), lambda x: x.cast("string")),
            " ",
        ).alias("vals_sorted"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k_int,
           CAST(props->>'$.k' AS BIGINT) * 2 AS k_doubled,
           CASE WHEN event_type IS NULL AND user_id IS NULL THEN '{}'
                WHEN event_type IS NULL
                THEN to_json(struct_pack(u := user_id))
                WHEN user_id IS NULL
                THEN to_json(struct_pack(t := event_type))
                ELSE to_json(struct_pack(t := event_type, u := user_id))
           END AS packed
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extract (props is a JSON string column) + struct→JSON pack;
    both engines emit compact JSON with insertion-ordered fields (probed).
    Spark's to_json OMITS null struct fields where DuckDB serializes
    "t":null — the oracle drops the field explicitly for EVERY null key
    (t, u, or both — r6 ADVICE: the original only masked t because no
    fixture salts NULL user_id; the symmetric CASE removes the latent
    asymmetry)."""
    ev = load(spark, sf_dir, "events")
    # BIGINT extraction (extreme regime): a JSON int beyond 2^31 must not
    # overflow the cast, and beyond 2^53 must not round-trip through a
    # double — both paths here stay integral end-to-end
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("k_int"),
        (F.from_json("props", "k LONG")["k"] * 2).alias("k_doubled"),
        F.to_json(
            F.struct(F.col("event_type").alias("t"), F.col("user_id").alias("u"))
        ).alias("packed"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS b_and,
           l_orderkey | 15 AS b_or,
           xor(l_orderkey, l_linenumber) AS b_xor,
           l_orderkey << 2 AS b_shl,
           l_orderkey >> 3 AS b_shr,
           bit_count(l_orderkey) AS b_cnt
    FROM lineitem
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family — and/or/xor/shifts/popcount over the key columns
    (the primitive layer under the SimHash/banding ops in ops/llm.py)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("b_and"),
        F.col("l_orderkey").bitwiseOR(F.lit(15)).alias("b_or"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_linenumber").cast("long")).alias("b_xor"),
        F.shiftleft("l_orderkey", 2).alias("b_shl"),
        F.shiftright("l_orderkey", 3).alias("b_shr"),
        F.bit_count("l_orderkey").alias("b_cnt"),
    )


@register(
    "fn_regex",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_extract(c_name, '^([A-Za-z]+)#([0-9]+)$', 2) AS id_part,
           len(regexp_extract_all(c_name, '[0-9]')) AS n_digits,
           regexp_matches(c_name, '0{2,}') AS has_zero_run,
           regexp_replace(c_name, '(0+)([1-9])', '\\2', 'g') AS unpadded
    FROM customer
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: group extraction, extract-all counting, boolean match,
    backreference replacement — patterns kept in the Java∩RE2 subset, with
    Spark's idx argument ≡ DuckDB's group argument."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.regexp_extract("c_name", r"^([A-Za-z]+)#([0-9]+)$", 2).alias("id_part"),
        F.size(F.regexp_extract_all("c_name", F.lit(r"[0-9]"), F.lit(0))).alias(
            "n_digits"
        ),
        F.col("c_name").rlike("0{2,}").alias("has_zero_run"),
        F.regexp_replace("c_name", r"(0+)([1-9])", r"$2").alias("unpadded"),
    )


@register(
    "fn_fuzzy",
    oracle="""
    SELECT c_custkey,
           levenshtein(c_name, 'Customer#000000000') AS d_lit,
           levenshtein(c_name, replace(c_name, '0', 'O')) AS d_self,
           (levenshtein(c_name, 'Customer#000000000') <= 3) AS near_anchor
    FROM customer
    """,
)
def fn_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: Levenshtein distance to a fixed anchor, to a
    derived variant (distance = count of '0's replaced), and a banded
    near-match flag — the building block for fuzzy joins (at scale: band by
    length/prefix first so the quadratic distance only runs inside small
    candidate buckets, same pattern as the LSH dedup family)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.levenshtein("c_name", F.lit("Customer#000000000")).alias("d_lit"),
        F.levenshtein(
            "c_name", F.regexp_replace("c_name", "0", "O")
        ).alias("d_self"),
        (F.levenshtein("c_name", F.lit("Customer#000000000")) <= 3).alias(
            "near_anchor"
        ),
    )


@register(
    "fn_url",
    oracle="""
    WITH u AS (
      -- sanitize the free-text columns into URL-safe tokens (hostile-
      -- strings sweep: quotes/spaces/CJK in source made Java's URI parser
      -- throw INVALID_URL) — this op is scoped to parse_url on
      -- WELL-FORMED URLs; 'g' = replace ALL matches (DuckDB defaults to
      -- first-only, Spark to all)
      SELECT doc_id,
             'https://s' || regexp_replace(source, '[^A-Za-z0-9_-]', '', 'g')
               || '.example.com/docs/' || doc_id
               || '?lang=l' || regexp_replace(lang, '[^A-Za-z0-9_-]', '', 'g')
               || '&v=2' AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM u
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family: synthesize a well-formed URL per document, then
    parse host / path / query-param / protocol back out with Spark's
    JVM-side ``parse_url`` (the crawl-pipeline staple: domain extraction
    for source filtering and per-site quotas).  The oracle re-parses with
    anchored regexes — agreement proves parse_url's components match their
    regex definitions on well-formed URLs."""
    d = load(spark, sf_dir, "documents")
    # URL-safe sanitization mirrored in the oracle (hostile-strings sweep)
    safe = lambda c: F.regexp_replace(c, "[^A-Za-z0-9_-]", "")
    url = F.concat(
        F.lit("https://s"),
        safe(F.col("source")),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang=l"),
        safe(F.col("lang")),
        F.lit("&v=2"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("protocol"),
    )


@register(
    "fn_struct",
    oracle="""
    SELECT o_orderkey,
           struct_pack(k := o_orderkey, p := o_totalprice).k AS s_key,
           struct_pack(k := o_orderkey, p := o_totalprice).p AS s_price,
           (o_totalprice > 100000) AND (o_orderstatus = 'O') AS s_flag,
           to_json(struct_pack(
             id := o_orderkey,
             nested := struct_pack(st := o_orderstatus)
           )) AS s_json
    FROM orders
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct family — named_struct construction, field access (getField),
    predicates over fields, and nested struct→JSON rendering.  Struct
    columns themselves are projected back to scalars before returning so
    the driver's value-hash sees engine-neutral primitives (SURVEY §7.5:
    nested-type hash rendering is engine-specific)."""
    o = load(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    return o.select(
        "o_orderkey",
        s.getField("k").alias("s_key"),
        s.getField("p").alias("s_price"),
        ((F.col("o_totalprice") > 100000) & (F.col("o_orderstatus") == "O")).alias(
            "s_flag"
        ),
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("id"),
                F.struct(F.col("o_orderstatus").alias("st")).alias("nested"),
            )
        ).alias("s_json"),
    )


@register(
    "fn_interval",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS d,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE)
             AS plus_2mo,
           CAST(CAST(o_orderdate AS DATE) - INTERVAL 1 MONTH AS DATE)
             AS minus_1mo,
           CAST(CAST(o_orderdate AS DATE)
                + to_days(CAST(((1 - isodow(CAST(o_orderdate AS DATE)) + 6) % 7)
                               + 1 AS INTEGER)) AS DATE) AS next_monday,
           o_orderdate + INTERVAL 90 MINUTE AS plus_90min,
           o_orderdate - INTERVAL 36 HOUR AS minus_36h
    FROM orders
    """,
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic family: month addition with end-of-month
    clamping (both engines clamp Jan 31 + 1 mo -> Feb 28 [probed]),
    next-weekday, and sub-day timestamp offsets.  All pure Catalyst
    expressions; the DuckDB twin emulates next_day via isodow modular
    arithmetic (no native next_day there)."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("d"),
        F.add_months(d, 2).alias("plus_2mo"),
        F.add_months(d, -1).alias("minus_1mo"),
        F.next_day(d, "Mon").alias("next_monday"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 MINUTES")).alias("plus_90min"),
        (F.col("o_orderdate") - F.expr("INTERVAL 36 HOURS")).alias("minus_36h"),
    )


@register(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k_int,
           -- mirror variant's compact re-serialization for BOTH payload
           -- shapes ({"k":..} and {"k":..,"s":".."} — hostile-strings
           -- sweep); json_object applies standard JSON escaping exactly
           -- as Spark's to_json(variant) does
           CASE WHEN props IS NULL THEN NULL
                WHEN json_extract(props, '$.s') IS NOT NULL
                THEN json_object('k', CAST(props->>'$.k' AS BIGINT),
                                 's', props->>'$.s')
                ELSE json_object('k', CAST(props->>'$.k' AS BIGINT))
           END AS vjson,
           CASE WHEN props IS NULL THEN NULL
                WHEN json_extract(props, '$.s') IS NOT NULL
                THEN 'OBJECT<k: BIGINT, s: STRING>'
                ELSE 'OBJECT<k: BIGINT>' END AS vschema
    FROM events
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured data via Spark 4 VariantType: parse_json lifts the
    props JSON string into the binary variant encoding once, then typed
    path extraction (variant_get), canonical re-serialization (to_json on
    a variant is compact), and per-row schema inference
    (schema_of_variant).  The oracle rebuilds the compact form with
    json_object since DuckDB's JSON cast preserves source spacing.

    100 TB design: variant decodes the JSON text ONCE into a binary tree
    shredded for repeated typed access — the whole point vs
    get_json_object, which re-parses the string per extraction; all three
    derivations here share the single parse inside one codegen stage."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_int"),
        F.to_json(v).alias("vjson"),
        F.schema_of_variant(v).alias("vschema"),
    )


@register(
    "fn_xml",
    oracle="""
    SELECT c_custkey AS custkey,
           -- from_xml strips SURROUNDING whitespace from element text
           -- (StAX ignoreSurroundingSpaces — hostile-strings sweep:
           -- '  padded  ' reads back as 'padded'); interior whitespace
           -- survives, so the oracle trims the same character set
           trim(c_name, ' ' || chr(9) || chr(10) || chr(13)) AS name,
           c_acctbal AS bal,
           c_custkey AS xp_key
    FROM customer
    """,
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML surface: serialize each customer to an XML fragment, parse it
    back with from_xml (typed struct schema), and extract one field again
    via the xpath_long Hive-compatible path function.  The oracle is the
    round-trip identity — if any parse/typing step corrupted a value the
    hash would diverge.

    100 TB design: from_xml is a JVM-side expression inside codegen (one
    StAX parse per row, no Python); the op is a pure narrow projection."""
    c = load(spark, sf_dir, "customer")
    # NULL fields OMIT their element (the XML null convention) — inlining
    # a NULL into concat would null the whole document and lose the row's
    # non-null fields; from_xml reads a missing element back as NULL, so
    # NULL round-trips to NULL
    xml = F.concat(
        F.lit("<c><k>"),
        F.col("c_custkey").cast("string"),
        F.lit("</k>"),
        F.when(
            F.col("c_name").isNotNull(),
            F.concat(F.lit("<n>"), F.col("c_name"), F.lit("</n>")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("c_acctbal").isNotNull(),
            F.concat(
                F.lit("<b>"), F.col("c_acctbal").cast("string"), F.lit("</b>")
            ),
        ).otherwise(F.lit("")),
        F.lit("</c>"),
    )
    parsed = F.from_xml(xml, "k LONG, n STRING, b DOUBLE")
    return c.select(
        parsed.getField("k").alias("custkey"),
        parsed.getField("n").alias("name"),
        parsed.getField("b").alias("bal"),
        F.expr(
            "xpath_long(concat('<c><k>', CAST(c_custkey AS STRING),"
            " '</k></c>'), '/c/k/text()')"
        ).alias("xp_key"),
    )


@register(
    "fn_collation",
    oracle="""
    SELECT c_custkey,
           (lower(CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                       ELSE c_mktsegment END) = 'building') AS is_building,
           (CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                 ELSE c_mktsegment END ILIKE 'mach%') AS is_mach_prefix
    FROM customer
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): case-insensitive equality and prefix
    matching via COLLATE UTF8_LCASE on a deliberately mixed-case column
    (even keys lowercased) — collation-aware comparison semantics pushed
    into the engine instead of wrapping every predicate in lower().  The
    oracle states the same predicates with explicit lower()/ILIKE.

    100 TB design: collation is metadata on the comparison, so it keeps
    predicates sargable for pushdown/codegen rather than burying the
    column under a function call on every use."""
    c = load(spark, sf_dir, "customer")
    mixed = F.when(
        F.col("c_custkey") % 2 == 0, F.lower("c_mktsegment")
    ).otherwise(F.col("c_mktsegment"))
    lc = F.collate(mixed, "UTF8_LCASE")
    return c.select(
        "c_custkey",
        (lc == F.lit("building")).alias("is_building"),
        lc.startswith("MACH").alias("is_mach_prefix"),
    )


@register(
    "fn_try_safe",
    oracle="""
    WITH t AS (
      SELECT *, l_returnflag || ' ' || l_linestatus || ' ' ||
                CAST(l_quantity AS VARCHAR) AS s
      FROM lineitem WHERE l_orderkey % 32 = 0
    )
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE l_extendedprice / l_discount END AS safe_div,
           TRY_CAST(s AS DOUBLE) AS bad_cast,
           TRY_CAST('9e999' AS DOUBLE) AS overflow_lit,
           CASE WHEN l_linenumber <= len(string_split(s, ' '))
                THEN string_split(s, ' ')[l_linenumber]
                ELSE NULL END AS safe_elem
    FROM t
    """,
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe evaluation family: try_divide (NULL on divide-by-zero),
    try_cast (NULL on malformed input), and try_element_at (NULL past the
    end) — the ANSI-mode-compatible forms that turn data errors into NULLs
    instead of failing a 6-hour job on one bad row.  Spark 4 runs ANSI
    mode by default, so these are the idioms a production pipeline needs.

    The DuckDB oracle mirrors each with TRY_CAST / guarded CASE.  Note
    'Infinity': DuckDB TRY_CAST('9e999') yields +inf (same as Spark's
    cast) — both sides agree, the hash pins it.

    100 TB design: pure narrow projection in codegen; the value is
    semantic (partial-failure tolerance), not physical."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 32 == 0)
    s = F.concat_ws(
        " ", "l_returnflag", "l_linestatus", F.col("l_quantity").cast("string")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide("l_extendedprice", "l_discount").alias("safe_div"),
        s.try_cast("double").alias("bad_cast"),
        F.lit("9e999").try_cast("double").alias("overflow_lit"),
        F.try_element_at(F.split(s, " "), F.col("l_linenumber")).alias("safe_elem"),
    )


@register(
    "fn_lambda",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           -- ß pre-fold (hostile-strings sweep): Java's toUpperCase maps
           -- ß -> "SS" (1:2 expansion) where DuckDB maps it to the
           -- capital sharp-s 'ẞ'; folding ß before upper() reproduces the
           -- JVM mapping for the one divergent class in the battery
           array_to_string(list_transform(list_slice(toks, 1, 5),
                           x -> upper(replace(x, 'ß', 'ss'))), ' ')
             AS upper5,
           CASE WHEN toks IS NULL THEN NULL
                ELSE COALESCE(
                  array_to_string(list_filter(toks, x -> length(x) > 5), ' '),
                  '')
           END AS long_toks,
           CAST(len(list_filter(toks, x -> x = 'the')) > 0 AS INT) AS has_the,
           CAST(len(list_filter(toks, x -> length(x) > 12)) = 0 AS INT) AS all_short,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS INTEGER) AS char_sum,
           list_reduce(list_slice(toks, 1, 4), (a, x) -> a || '|' || x) AS piped4
    FROM t
    """,
)
def fn_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambda functions over arrays — transform / filter /
    exists / forall / aggregate (fold), the Catalyst-native way to compute
    on array columns WITHOUT exploding or leaving the JVM (SURVEY §2.H
    extension; fn_array covers the non-lambda surface).

    Oracle mapping: Spark transform/filter ↔ DuckDB list_transform/
    list_filter; exists/forall ↔ len(list_filter(...)) comparisons;
    aggregate(0, +) ↔ list_sum(list_transform); aggregate-with-concat ↔
    list_reduce (seeded with the first element, so Spark folds from
    element 2).  Array outputs projected through array_join (driver
    canonicalizer trap, SURVEY §7.5).

    Scale: pure narrow projection, zero shuffle, all six expressions in
    one whole-stage-codegen pass over the tokenized column."""
    d = load(spark, sf_dir, "documents")
    # materialized token split (r11, guide §1.2): six sibling expressions
    # each inlined the split — six splits per row collapsed to one
    base = d.select("doc_id", F.split("text", " ").alias("toks"))
    toks = F.col("toks")
    return base.select(
        "doc_id",
        F.array_join(
            F.transform(F.slice(toks, 1, 5), lambda x: F.upper(x)), " "
        ).alias("upper5"),
        F.array_join(
            F.filter(toks, lambda x: F.length(x) > 5), " "
        ).alias("long_toks"),
        F.exists(toks, lambda x: x == "the").cast("int").alias("has_the"),
        F.forall(toks, lambda x: F.length(x) <= 12).cast("int").alias("all_short"),
        F.aggregate(
            toks, F.lit(0), lambda acc, x: acc + F.length(x)
        ).alias("char_sum"),
        F.aggregate(
            F.slice(toks, 2, 3),
            F.element_at(toks, 1),
            lambda acc, x: F.concat(acc, F.lit("|"), x),
        ).alias("piped4"),
    )


@register(
    "fn_surrogate_key",
    oracle="""
    WITH h AS (SELECT o_orderkey, md5('ord|' || o_orderkey) AS hx FROM orders)
    SELECT o_orderkey,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-' ||
           substr(hx, 13, 4) || '-' || substr(hx, 17, 4) || '-' ||
           substr(hx, 21, 12) AS uuid_key,
           ('0x' || substr(hx, 1, 15))::BIGINT AS bigint_key
    FROM h
    """,
)
def fn_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate keys from business keys — the warehouse
    pattern for stable ids across re-loads (unlike uuid()/rand(), which
    would also be untestable): a namespaced md5 formatted as a UUID-shaped
    string plus a 60-bit bigint key (15 hex chars — always positive,
    fits a signed long exactly).

    Both derivations are pure narrow projections over the same digest;
    the namespace prefix ('ord|') keeps keys from colliding across
    entity types that share numeric ids.  Identical string/hex math on
    both engines → full hash oracle."""
    o = load(spark, sf_dir, "orders")
    hx = F.md5(F.concat(F.lit("ord|"), F.col("o_orderkey").cast("string")))
    return o.select(
        "o_orderkey",
        F.concat_ws(
            "-",
            F.substring(hx, 1, 8),
            F.substring(hx, 9, 4),
            F.substring(hx, 13, 4),
            F.substring(hx, 17, 4),
            F.substring(hx, 21, 12),
        ).alias("uuid_key"),
        F.conv(F.substring(hx, 1, 15), 16, 10).cast("long").alias("bigint_key"),
    )


@register(
    "fn_bitpack_key",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (l_orderkey << 8) | l_linenumber AS packed,
           ((l_orderkey << 8) | l_linenumber) >> 8 AS unpacked_order,
           ((l_orderkey << 8) | l_linenumber) & 255 AS unpacked_line
    FROM lineitem
    """,
)
def fn_bitpack_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-packed composite key: (orderkey, linenumber) folded into ONE
    long via shift/or, and unpacked back via shift/mask — the technique
    that turns a two-column join/sort key into a single 8-byte key
    (smaller shuffles, single-column sort runs, direct use as an array
    index).  Linenumber is 1..7, so 8 bits is comfortable headroom and
    the round-trip is exact; both unpack columns hash-verify the
    inverse.  Pure narrow projection in whole-stage codegen."""
    li = load(spark, sf_dir, "lineitem")
    packed = F.shiftleft(F.col("l_orderkey"), 8).bitwiseOR(F.col("l_linenumber"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        packed.alias("packed"),
        F.shiftright(packed, 8).alias("unpacked_order"),
        packed.bitwiseAND(F.lit(255)).alias("unpacked_line"),
    )


@register(
    "fn_ip_subnet",
    oracle="""
    WITH ips AS (
      SELECT DISTINCT user_id,
             (user_id * 2654435761) % 4294967296 AS ip
      FROM events
    ),
    oct AS (
      SELECT user_id, ip,
             CAST(FLOOR(ip / 16777216) AS BIGINT) % 256 AS o1,
             CAST(FLOOR(ip / 65536) AS BIGINT) % 256 AS o2
      FROM ips
    )
    SELECT o1 || '.' || o2 || '.0.0/16' AS subnet,
           COUNT(*) AS n_users,
           MIN(ip) AS min_ip,
           MAX(ip) AS max_ip
    FROM oct
    GROUP BY 1
    """,
)
def fn_ip_subnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 arithmetic in pure integer expressions: derive a deterministic
    synthetic IP per user (Knuth multiplicative hash mod 2^32 — the
    fixture has no IP column; a real pipeline would parse one with
    ``split('.')`` + the same octet math), bucket into /16 subnets, and
    profile users per subnet — the geo/abuse rollup shape (CIDR
    grouping, scanner detection, rate-limit keying).

    Determinism: all arithmetic is exact 64-bit integer (ip < 2^32, so
    double FLOOR division is exact too — both engines agree bit-for-bit);
    no hash functions, no floats in the output.

    Scale (100 TB): distinct-user dedup is a digest-width shuffle on
    user_id; octet extraction is whole-stage-codegen projection; the
    final aggregate has ≤65,536 possible keys with map-side partials —
    the textbook shrinking-cardinality pipeline."""
    ev = load(spark, sf_dir, "events")
    ips = ev.select("user_id").distinct().select(
        "user_id",
        ((F.col("user_id") * F.lit(2654435761)) % F.lit(4294967296)).alias("ip"),
    )
    o1 = (F.floor(F.col("ip") / 16777216).cast("long") % 256)
    o2 = (F.floor(F.col("ip") / 65536).cast("long") % 256)
    return (
        ips.select(
            F.concat_ws(
                "", o1.cast("string"), F.lit("."), o2.cast("string"), F.lit(".0.0/16")
            ).alias("subnet"),
            "ip",
        )
        .groupBy("subnet")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("ip").alias("min_ip"),
            F.max("ip").alias("max_ip"),
        )
    )


@register(
    "fn_calendar_dim",
    oracle="""
    WITH bounds AS (
      SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
             CAST(MAX(o_orderdate) AS DATE) AS hi
      FROM orders
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
               AS d
      FROM bounds
    )
    SELECT d,
           dayofweek(d) AS dow0,
           CASE WHEN dayofweek(d) IN (0, 6) THEN 1 ELSE 0 END AS is_weekend,
           CAST(date_part('month', d) AS BIGINT) AS month,
           CAST(date_part('quarter', d) AS BIGINT) AS quarter,
           CASE WHEN d = last_day(d) THEN 1 ELSE 0 END AS is_month_end
    FROM spine
    """,
)
def fn_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar dimension covering the fact table's date span —
    the date spine every warehouse joins for fiscal/weekend/month-end
    logic, built by the engine (sequence + explode) rather than loaded.
    Day-of-week parity trap: Spark's dayofweek() is 1=Sunday, DuckDB's is
    0=Sunday — normalized to the 0=Sunday convention explicitly on both
    sides rather than trusting either default.

    Scale: the spine generates from the AGGREGATED min/max (one row in,
    |days| rows out — a century is 36,525 rows); never explode per-fact.
    Joining facts to it is a broadcast by construction."""
    o = load(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    dow0 = F.dayofweek("d") - 1
    return spine.select(
        "d",
        dow0.alias("dow0"),
        F.when(dow0.isin(0, 6), 1).otherwise(0).alias("is_weekend"),
        F.month("d").cast("long").alias("month"),
        F.quarter("d").cast("long").alias("quarter"),
        F.when(F.col("d") == F.last_day("d"), 1).otherwise(0).alias("is_month_end"),
    )


@register(
    "fn_rendezvous_hash_routing",
    oracle="""
    WITH keys AS (
      SELECT DISTINCT user_id FROM events
    ),
    weighted AS (
      SELECT k.user_id, n.node,
             md5(CAST(k.user_id AS VARCHAR) || '|node' || n.node) AS w
      FROM keys k, unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS n(node)
    ),
    routed AS (
      SELECT user_id, node,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY w DESC, node) AS rk
      FROM weighted
    )
    SELECT node, COUNT(*) AS n_keys,
           MIN(user_id) AS min_key, MAX(user_id) AS max_key
    FROM routed WHERE rk = 1
    GROUP BY node
    """,
)
def fn_rendezvous_hash_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing: route each key to the
    node with the highest md5(key, node) weight — the consistent-routing
    scheme where removing one node reassigns ONLY that node's keys
    (plain `hash(key) % N` reshuffles ~everything when N changes; HRW
    and jump-hash are why shard maps survive topology changes).  The op
    reports the per-node key balance, the thing you check before
    trusting a routing function.

    Determinism: md5 is identical across engines and the (weight DESC,
    node) order is total — no RNG, fully replayable.

    Scale (100 TB): |keys|×|nodes| weight rows explode from a flatMap
    (no shuffle), and the per-key argmax is a window over |nodes|=8 rows
    riding one hashpartitioning(user_id) exchange; for huge node counts
    compute the max with a map-side aggregate instead of a window."""
    ev = load(spark, sf_dir, "events")
    keys = ev.select("user_id").distinct()
    weighted = keys.select(
        "user_id",
        F.explode(F.array(*[F.lit(i) for i in range(8)])).alias("node"),
    ).select(
        "user_id",
        "node",
        F.md5(
            F.concat(
                F.col("user_id").cast("string"),
                F.lit("|node"),
                F.col("node").cast("string"),
            )
        ).alias("w"),
    )
    wr = Window.partitionBy("user_id").orderBy(F.col("w").desc(), F.col("node"))
    routed = weighted.select(
        "user_id", "node", F.row_number().over(wr).alias("rk")
    ).filter(F.col("rk") == 1)
    return routed.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.min("user_id").alias("min_key"),
        F.max("user_id").alias("max_key"),
    )


@register(
    "fn_decimal_money_exactness",
    oracle="""
    WITH x AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS price_d,
             CAST(l_discount AS DECIMAL(18,2)) AS disc_d
      FROM lineitem WHERE l_orderkey % 97 = 0
    )
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(CAST(price_d * (1 - disc_d) AS DECIMAL(18,4)))
                AS VARCHAR) AS exact_revenue,
           CAST(SUM(ROUND(price_d * (1 - disc_d), 2)) AS VARCHAR)
             AS rounded_per_line_revenue,
           CAST(SUM(CAST(price_d * (1 - disc_d) AS DECIMAL(18,4)))
                - SUM(ROUND(price_d * (1 - disc_d), 2)) AS VARCHAR)
             AS rounding_drift
    FROM x
    """,
)
def fn_decimal_money_exactness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money arithmetic done in DECIMAL, not double: revenue computed at
    full decimal(18,4) precision vs the same revenue when each line is
    rounded to cents first — the per-line-rounding drift that finance
    reconciliation flags (sum-then-round ≠ round-then-sum).  Results
    return as exact decimal STRINGS so the value hash compares true
    decimal equality, never a float representation.

    This is the complement to exprs.lsum (fast fixed-point for
    hash-stable analytics): when the requirement is accounting-grade
    decimal semantics — scale propagation, banker's-vs-half-up control,
    audited drift — the DECIMAL type is the tool, at ~12x the codegen
    cost (SCALE.md 'Aggregation fast path').

    Scale: both sums are ordinary two-phase decimal aggregates —
    mergeable, map-side combined; decimal(18,s) fits in a long
    internally so memory matches bigint aggregation."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 97 == 0)
    price_d = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_d = F.col("l_discount").cast("decimal(18,2)")
    line = (price_d * (F.lit(1) - disc_d)).cast("decimal(18,4)")
    line_rounded = F.round(price_d * (F.lit(1) - disc_d), 2)
    return li.select(line.alias("l"), line_rounded.alias("lr")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("l").cast("string").alias("exact_revenue"),
        F.sum("lr").cast("string").alias("rounded_per_line_revenue"),
        (F.sum("l") - F.sum("lr")).cast("string").alias("rounding_drift"),
    )


@register(
    "fn_business_days",
    oracle="""
    WITH lt AS (
      SELECT l_orderkey, l_linenumber,
             datediff('day', DATE '1970-01-05',
                      CAST(o.o_orderdate AS DATE)) AS m1,
             datediff('day', DATE '1970-01-05',
                      CAST(l.l_shipdate AS DATE)) AS m2,
             datediff('day', CAST(o.o_orderdate AS DATE),
                      CAST(l.l_shipdate AS DATE)) AS cal_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_orderkey % 499 = 0
        AND CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
    )
    SELECT l_orderkey, l_linenumber, cal_days,
           (5 * (m2 // 7) + least(m2 % 7 + 1, 5))
           - (5 * (m1 // 7) + least(m1 % 7 + 1, 5)) AS business_days
    FROM lt
    """,
)
def fn_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business days between order and ship date — SLA clocks run on
    working days, not calendar days, and the two diverge by ~28%.
    Computed as a DIFFERENCE OF CUMULATIVE WEEKDAY COUNTS from a fixed
    Monday epoch (1970-01-05): W(d) = 5·⌊m/7⌋ + min(m mod 7 + 1, 5)
    counts weekdays in [epoch, d], so W(d₂) − W(d₁) is exactly the
    weekdays in (d₁, d₂] — no per-day explosion, no calendar join, and
    no weekday-remainder case analysis (a first draft with the classic
    lead-in/wrap closed form was WRONG in ~35% of spans and both
    engines agreed on the wrong value — caught only by a brute-force
    Python check, now pinned in tests/test_edge_cases.py; a shared
    formula is a shared bug, which is why the test exists).
    Holidays would subtract an anti-join count against
    fn_calendar_dim's spine.  Negative spans (this synthetic fixture
    ships some lines before the order date) are excluded: business-day
    counting is defined forward; all m are positive so floor-div and
    mod agree across engines.

    Scale (100 TB): pure integer codegen per row after the key join —
    the closed form is exactly why: a generate-days-and-filter approach
    multiplies the fact table by the date span."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 499 == 0)
    o = load(spark, sf_dir, "orders")
    ref = F.lit("1970-01-05").cast("date")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate").cast("date")
            >= F.col("o_orderdate").cast("date")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.datediff(F.col("o_orderdate").cast("date"), ref).alias("m1"),
            F.datediff(F.col("l_shipdate").cast("date"), ref).alias("m2"),
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("cal_days"),
        )
    )
    W = lambda m: 5 * F.floor(m / 7).cast("long") + F.least(
        m % 7 + 1, F.lit(5)
    )
    return j.select(
        "l_orderkey",
        "l_linenumber",
        "cal_days",
        (W(F.col("m2")) - W(F.col("m1"))).alias("business_days"),
    )


def _luhn_sql(expr: str) -> str:
    """Closed-form Luhn sum over a fixed 12-digit number (no loop):
    digit k (0 = rightmost) via integer div/mod, every odd position
    doubled with the >9 ? −9 digit-sum fold."""
    terms = []
    for k in range(12):
        d = f"(({expr} // {10 ** k}) % 10)"
        if k % 2 == 1:
            terms.append(f"(2*{d} - CASE WHEN 2*{d} > 9 THEN 9 ELSE 0 END)")
        else:
            terms.append(d)
    return " + ".join(terms)


@register(
    "fn_luhn_check",
    oracle=f"""
    WITH acct AS (
      SELECT c_custkey,
             CAST(100000000000 + c_custkey * 37 AS BIGINT) AS acct
      FROM customer WHERE c_custkey % 5 = 0
    ),
    summed AS (
      SELECT c_custkey, acct,
             CAST({_luhn_sql('acct')} AS BIGINT) AS luhn_sum
      FROM acct
    )
    SELECT c_custkey, acct, luhn_sum,
           CASE WHEN luhn_sum % 10 = 0 THEN 1 ELSE 0 END AS is_valid,
           CAST((10 - (luhn_sum
                 - ((acct // 1) % 10)) % 10) % 10 AS BIGINT)
             AS correct_check_digit
    FROM summed
    """,
)
def fn_luhn_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn (mod-10) checksum validation over synthesized 12-digit
    account numbers — the payment-card / IMEI / account-number
    integrity check a DQ pipeline runs on identifier columns before
    trusting joins on them (dq_duplicate_payments' natural
    companion).  The checksum is a CLOSED FORM: each digit extracted
    by integer div/mod, odd positions doubled with the digit-sum
    fold, all twelve terms summed in one expression — no UDF, no
    loop, pure whole-stage-codegen arithmetic on both engines; also
    emits the check digit that WOULD make each number valid.

    Scale (100 TB): per-row integer projection, no shuffle — runs
    inside the scan like every fn_* family op."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 == 0)
    acct = c.select(
        "c_custkey",
        (F.lit(100000000000) + F.col("c_custkey") * 37)
        .cast("long")
        .alias("acct"),
    )
    spark_luhn = _luhn_sql("acct").replace("//", "DIV")
    summed = acct.select(
        "c_custkey",
        "acct",
        F.expr(f"CAST({spark_luhn} AS BIGINT)").alias("luhn_sum"),
    )
    return summed.select(
        "c_custkey",
        "acct",
        "luhn_sum",
        F.when(F.col("luhn_sum") % 10 == 0, 1).otherwise(0).alias("is_valid"),
        F.expr(
            "CAST((10 - (luhn_sum - ((acct DIV 1) % 10)) % 10) % 10 AS BIGINT)"
        ).alias("correct_check_digit"),
    )


@register(
    "fn_human_number_parse",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CAST((o_orderkey % 9999) / 10.0 AS VARCHAR)
               || CASE o_orderkey % 4 WHEN 0 THEN ''
                  WHEN 1 THEN 'k' WHEN 2 THEN 'M' ELSE 'B' END AS s
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    parsed AS (
      SELECT o_orderkey, s,
             CAST(regexp_extract(s, '^[0-9.+-]+') AS DOUBLE) AS num,
             CASE regexp_extract(s, '[kMB]$')
                  WHEN 'k' THEN 1000
                  WHEN 'M' THEN 1000000
                  WHEN 'B' THEN 1000000000
                  ELSE 1 END AS mult
      FROM raw
    )
    SELECT o_orderkey, s AS raw_str,
           CAST(ROUND(num * mult) AS BIGINT) AS parsed_value
    FROM parsed
    """,
)
def fn_human_number_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Human-formatted number parsing ('12.5k', '3M', '1.2B' → exact
    integers) — the ETL cleaner for scraped metrics columns (view
    counts, follower counts, file sizes) that arrive as display
    strings; regex splits the numeric prefix from the magnitude
    suffix, a CASE maps the multiplier, and ROUND lands the exact
    integer.  Fixture strings synthesize deterministically from
    orderkey with one decimal place and a cycling suffix so every
    multiplier branch exercises.

    Scale (100 TB): pure regexp + arithmetic projection, no
    shuffle."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 3 == 0)
    raw = o.select(
        "o_orderkey",
        F.concat(
            ((F.col("o_orderkey") % 9999) / 10.0).cast("string"),
            F.when(F.col("o_orderkey") % 4 == 0, "")
            .when(F.col("o_orderkey") % 4 == 1, "k")
            .when(F.col("o_orderkey") % 4 == 2, "M")
            .otherwise("B"),
        ).alias("s"),
    )
    parsed = raw.select(
        "o_orderkey",
        "s",
        F.regexp_extract("s", "^[0-9.+-]+", 0).cast("double").alias("num"),
        F.when(F.regexp_extract("s", "[kMB]$", 0) == "k", 1000)
        .when(F.regexp_extract("s", "[kMB]$", 0) == "M", 1000000)
        .when(F.regexp_extract("s", "[kMB]$", 0) == "B", 1000000000)
        .otherwise(1)
        .alias("mult"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("s").alias("raw_str"),
        F.round(F.col("num") * F.col("mult"))
        .cast("long")
        .alias("parsed_value"),
    )


@register(
    "fn_route_pattern_match",
    oracle="""
    WITH paths AS (
      SELECT CASE event_type
               WHEN 'purchase' THEN '/api/users/' || user_id
                 || '/orders/' || event_id
               WHEN 'view' THEN '/catalog/item/' || (event_id % 500)
               WHEN 'click' THEN '/catalog/item/' || (event_id % 500)
                 || '/related'
               WHEN 'signup' THEN '/account/new'
               ELSE '/internal/errors/' || (event_id % 50)
             END AS path
      FROM events
    ),
    routed AS (
      SELECT regexp_replace(path, '/[0-9]+', '/:id', 'g') AS route,
             regexp_extract(path, '[0-9]+') AS first_id
      FROM paths
    )
    SELECT route, COUNT(*) AS n_requests,
           COUNT(DISTINCT first_id) AS n_distinct_first_id
    FROM routed GROUP BY route
    """,
)
def fn_route_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL route templating: raw request paths collapse to their route
    patterns (numeric path segments → :id) with request counts and
    distinct-entity cardinality per route — how API analytics turns
    ten million distinct URLs into twelve routes, and the
    prerequisite for any per-endpoint latency/error rollup
    (agg_slo_burn_rate per route).  Paths synthesize deterministically
    from events so every template branch exercises, including the
    nested two-parameter route.

    Scale (100 TB): regex projection + a map-side-combined count on
    the (tiny) route vocabulary — template-mining economics on URLs."""
    e = load(spark, sf_dir, "events")
    path = (
        F.when(
            F.col("event_type") == "purchase",
            F.concat(
                F.lit("/api/users/"),
                F.col("user_id").cast("string"),
                F.lit("/orders/"),
                F.col("event_id").cast("string"),
            ),
        )
        .when(
            F.col("event_type") == "view",
            F.concat(
                F.lit("/catalog/item/"), (F.col("event_id") % 500).cast("string")
            ),
        )
        .when(
            F.col("event_type") == "click",
            F.concat(
                F.lit("/catalog/item/"),
                (F.col("event_id") % 500).cast("string"),
                F.lit("/related"),
            ),
        )
        .when(F.col("event_type") == "signup", F.lit("/account/new"))
        .otherwise(
            F.concat(
                F.lit("/internal/errors/"),
                (F.col("event_id") % 50).cast("string"),
            )
        )
    )
    routed = e.select(
        F.regexp_replace(path, "/[0-9]+", "/:id").alias("route"),
        F.regexp_extract(path, "[0-9]+", 0).alias("first_id"),
    )
    return routed.groupBy("route").agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.countDistinct("first_id").alias("n_distinct_first_id"),
    )


@register(
    "fn_semver_order",
    oracle="""
    WITH vers AS (
      SELECT p_partkey,
             'v' || (p_partkey % 3) || '.' || (p_partkey % 12)
               || '.' || (p_partkey % 25) AS version
      FROM part WHERE p_partkey % 50 = 0
    ),
    keyed AS (
      SELECT p_partkey, version,
             CAST(split_part(substr(version, 2), '.', 1) AS BIGINT)
               * 1000000
             + CAST(split_part(version, '.', 2) AS BIGINT) * 1000
             + CAST(split_part(version, '.', 3) AS BIGINT) AS sort_key
      FROM vers
    )
    SELECT p_partkey, version,
           ROW_NUMBER() OVER (ORDER BY sort_key, p_partkey) AS semver_rank,
           ROW_NUMBER() OVER (ORDER BY version, p_partkey) AS lex_rank,
           CASE WHEN ROW_NUMBER() OVER (ORDER BY sort_key, p_partkey)
                     <> ROW_NUMBER() OVER (ORDER BY version, p_partkey)
                THEN 1 ELSE 0 END AS rank_differs
    FROM keyed
    """,
)
def fn_semver_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-version ordering: version strings parse into a numeric
    (major, minor, patch) sort key so v0.9.2 < v0.10.0 — the compare
    every artifact registry, dependency resolver and release
    dashboard needs, where naive lexicographic ORDER BY silently
    mis-sorts ('v0.10.0' < 'v0.9.0' as strings).  Both rankings are
    emitted with a flag on every row the two orders DISAGREE on, so
    the op is its own demonstration of why the parse matters.

    Scale (100 TB): the parse is split_part arithmetic in the scan;
    ranking is one global sort (range-partitioned at scale) — and in
    practice the numeric sort_key becomes the stored column so the
    sort happens once at write."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 50 == 0)
    vers = p.select(
        "p_partkey",
        F.concat(
            F.lit("v"),
            (F.col("p_partkey") % 3).cast("string"),
            F.lit("."),
            (F.col("p_partkey") % 12).cast("string"),
            F.lit("."),
            (F.col("p_partkey") % 25).cast("string"),
        ).alias("version"),
    )
    keyed = vers.select(
        "p_partkey",
        "version",
        (
            F.split_part(F.substring("version", 2, 100), F.lit("."), F.lit(1))
            .cast("long")
            * 1000000
            + F.split_part(F.col("version"), F.lit("."), F.lit(2)).cast("long")
            * 1000
            + F.split_part(F.col("version"), F.lit("."), F.lit(3)).cast("long")
        ).alias("sort_key"),
    )
    w_sem = Window.orderBy("sort_key", "p_partkey")
    w_lex = Window.orderBy("version", "p_partkey")
    return keyed.select(
        "p_partkey",
        "version",
        F.row_number().over(w_sem).alias("semver_rank"),
        F.row_number().over(w_lex).alias("lex_rank"),
        F.when(
            F.row_number().over(w_sem) != F.row_number().over(w_lex), 1
        )
        .otherwise(0)
        .alias("rank_differs"),
    )


@register(
    "fn_iban_mod97",
    oracle="""
    WITH acct AS (
      SELECT c_custkey,
             CAST((c_custkey * 7919) % 100000000000000 AS BIGINT) AS bban
      FROM customer WHERE c_custkey % 8 = 0
    ),
    checked AS (
      SELECT c_custkey, bban,
             CAST(98 - (bban * 100) % 97 AS BIGINT) AS check_digits
      FROM acct
    )
    SELECT c_custkey, bban, check_digits,
           CASE WHEN (bban * 100 + check_digits) % 97 = 1
                THEN 1 ELSE 0 END AS is_valid,
           CASE WHEN ((bban + 1) * 100 + check_digits) % 97 = 1
                THEN 1 ELSE 0 END AS corrupted_still_valid
    FROM checked
    """,
)
def fn_iban_mod97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IBAN-style mod-97 check digits (ISO 7064): the international
    bank-account integrity scheme next to fn_luhn_check's mod-10 —
    check digits are 98 − (bban·100 mod 97), and a number is valid
    iff the full value ≡ 1 (mod 97), which catches ALL single-digit
    errors and virtually all transpositions (mod-10 misses some).
    Every row also validates a deliberately corrupted sibling
    (bban+1) to demonstrate detection — corrupted_still_valid is 0
    except the ~1-in-97 residue collisions the scheme's guarantee
    allows.  Pure 64-bit integer arithmetic, no strings, no loops.

    Scale (100 TB): per-row div/mod projection in the scan, exactly
    like the Luhn op."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 8 == 0)
    acct = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 7919) % 100000000000000)
        .cast("long")
        .alias("bban"),
    )
    checked = acct.select(
        "c_custkey",
        "bban",
        (98 - (F.col("bban") * 100) % 97).cast("long").alias("check_digits"),
    )
    return checked.select(
        "c_custkey",
        "bban",
        "check_digits",
        F.when(
            (F.col("bban") * 100 + F.col("check_digits")) % 97 == 1, 1
        )
        .otherwise(0)
        .alias("is_valid"),
        F.when(
            ((F.col("bban") + 1) * 100 + F.col("check_digits")) % 97 == 1, 1
        )
        .otherwise(0)
        .alias("corrupted_still_valid"),
    )


@register(
    "fn_progressive_brackets",
    oracle="""
    WITH fp AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 1000000) AS BIGINT) AS v6
      FROM orders WHERE o_orderkey % 15 = 0
    ),
    taxed AS (
      SELECT o_orderkey, v6,
             LEAST(v6, 100000000000) // 10
             + CASE WHEN v6 > 100000000000
               THEN (LEAST(v6, 300000000000) - 100000000000) // 5
               ELSE 0 END
             + CASE WHEN v6 > 300000000000
               THEN (v6 - 300000000000) * 3 // 10 ELSE 0 END AS tax6
      FROM fp
    )
    SELECT o_orderkey,
           round(v6 / 1e6, 6) AS amount,
           round(tax6 / 1e6, 6) AS tax,
           round(tax6 / CAST(v6 AS DOUBLE), 6) AS effective_rate
    FROM taxed
    """,
)
def fn_progressive_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive (marginal) bracket computation: 10% on the first
    100k, 20% on 100k–300k, 30% above — the piecewise-linear marginal
    schedule behind income tax, tiered pricing, volume discounts and
    commission plans, written as closed-form LEAST/CASE arithmetic
    (each bracket taxes only its own slice) rather than a per-row
    loop.  All slices compute in exact integer micro-units with
    integer division, so the tax and the effective rate ladder are
    engine-identical; effective_rate visibly climbing toward the top
    marginal rate is the sanity check.

    Scale (100 TB): pure codegen arithmetic in the scan; adding a
    bracket adds a CASE term, never a pass."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 15 == 0)
    v6 = fp_scaled_long(F.col("o_totalprice"), 1_000_000)
    fp = o.select("o_orderkey", v6.alias("v6"))
    b1 = F.expr("LEAST(v6, 100000000000) DIV 10")
    b2 = F.when(
        F.col("v6") > 100000000000,
        F.expr("(LEAST(v6, 300000000000) - 100000000000) DIV 5"),
    ).otherwise(0)
    b3 = F.when(
        F.col("v6") > 300000000000,
        F.expr("(v6 - 300000000000) * 3 DIV 10"),
    ).otherwise(0)
    taxed = fp.select(
        "o_orderkey", "v6", (b1 + b2 + b3).cast("long").alias("tax6")
    )
    return taxed.select(
        "o_orderkey",
        F.round(F.col("v6") / 1e6, 6).alias("amount"),
        F.round(F.col("tax6") / 1e6, 6).alias("tax"),
        F.round(F.col("tax6") / F.col("v6").cast("double"), 6).alias(
            "effective_rate"
        ),
    )


@register(
    "fn_number_humanize",
    oracle="""
    WITH vals AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice) AS BIGINT) * (o_orderkey % 7 + 1)
               AS v
      FROM orders WHERE o_orderkey % 12 = 0
    )
    SELECT o_orderkey, v,
           CASE WHEN v >= 1000000000
                THEN CAST(v // 100000000 / 10.0 AS VARCHAR) || 'B'
                WHEN v >= 1000000
                THEN CAST(v // 100000 / 10.0 AS VARCHAR) || 'M'
                WHEN v >= 1000
                THEN CAST(v // 100 / 10.0 AS VARCHAR) || 'k'
                ELSE CAST(v AS VARCHAR) END AS humanized
    FROM vals
    """,
)
def fn_number_humanize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Number humanization — fn_human_number_parse's inverse: exact
    integers render as display strings with one decimal and a
    magnitude suffix (1234567 → '1.2M'), the formatter behind every
    dashboard tile.  Truncation (integer-divide to the tenths grid,
    never round-half) keeps the rendered digit identical on both
    engines regardless of float formatting differences — the
    deliberate determinism trade a display formatter can make.

    Scale (100 TB): pure integer CASE projection, no shuffle."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 12 == 0)
    vals = o.select(
        "o_orderkey",
        (
            (
                F.signum("o_totalprice")
                * ((F.abs(F.col("o_totalprice")) + 0.5).cast("long"))
            ).cast("long")
            * (F.col("o_orderkey") % 7 + 1)
        ).alias("v"),
    )
    return vals.select(
        "o_orderkey",
        "v",
        F.when(
            F.col("v") >= 1000000000,
            F.concat(
                (F.expr("v DIV 100000000") / 10.0).cast("string"), F.lit("B")
            ),
        )
        .when(
            F.col("v") >= 1000000,
            F.concat(
                (F.expr("v DIV 100000") / 10.0).cast("string"), F.lit("M")
            ),
        )
        .when(
            F.col("v") >= 1000,
            F.concat((F.expr("v DIV 100") / 10.0).cast("string"), F.lit("k")),
        )
        .otherwise(F.col("v").cast("string"))
        .alias("humanized"),
    )


@register(
    "fn_uuid_deterministic",
    oracle="""
    WITH h AS (
      SELECT c_custkey, md5('cust:' || CAST(c_custkey AS VARCHAR)) AS hx
      FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT c_custkey,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-3'
             || substr(hx, 14, 3) || '-'
             || CASE WHEN substr(hx, 17, 1) IN ('0','4','8','c') THEN '8'
                     WHEN substr(hx, 17, 1) IN ('1','5','9','d') THEN '9'
                     WHEN substr(hx, 17, 1) IN ('2','6','a','e') THEN 'a'
                     ELSE 'b' END
             || substr(hx, 18, 3) || '-' || substr(hx, 21, 12) AS entity_uuid
    FROM h
    """,
)
def fn_uuid_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Name-based deterministic UUIDs (RFC 4122 v3 shape): md5 of a
    namespace-qualified natural key, reformatted with the version
    nibble forced to 3 and the variant nibble folded into 8/9/a/b —
    the idempotent entity-id mint every warehouse needs when the same
    customer must get the SAME uuid on every run and every cluster
    (random UUIDs break reruns and joins; fn_surrogate_key covers the
    integer variant).  The variant fold (d & 0x3 | 0x8) is written as
    a 16-way CASE so both engines do pure string ops — no hex-int
    conversion builtins needed.

    Scale (100 TB): embarrassingly parallel projection, whole-stage
    codegen, no shuffle."""
    c = load(spark, sf_dir, "customer")
    hx = F.md5(F.concat(F.lit("cust:"), F.col("c_custkey").cast("string")))
    d17 = F.substring(hx, 17, 1)
    variant = (
        F.when(d17.isin("0", "4", "8", "c"), F.lit("8"))
        .when(d17.isin("1", "5", "9", "d"), F.lit("9"))
        .when(d17.isin("2", "6", "a", "e"), F.lit("a"))
        .otherwise(F.lit("b"))
    )
    return c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.concat(
            F.substring(hx, 1, 8), F.lit("-"),
            F.substring(hx, 9, 4), F.lit("-3"),
            F.substring(hx, 14, 3), F.lit("-"),
            variant,
            F.substring(hx, 18, 3), F.lit("-"),
            F.substring(hx, 21, 12),
        ).alias("entity_uuid"),
    )


@register(
    "fn_fiscal_calendar_445",
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN EXTRACT(month FROM o_orderdate) >= 2
                  THEN EXTRACT(year FROM o_orderdate)
                  ELSE EXTRACT(year FROM o_orderdate) - 1 END AS fy
             , o_orderdate
      FROM orders
    ),
    wk AS (
      SELECT o_orderkey, cents, fy,
             LEAST(51, datediff('day',
                   make_date(CAST(fy AS INTEGER), 2, 1), o_orderdate) // 7)
               AS fweek
      FROM base
    )
    SELECT fy AS fiscal_year,
           fweek // 13 + 1 AS fiscal_quarter,
           (fweek // 13) * 3
             + CASE WHEN fweek % 13 < 4 THEN 1
                    WHEN fweek % 13 < 8 THEN 2 ELSE 3 END AS fiscal_period,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM wk
    GROUP BY 1, 2, 3
    """,
)
def fn_fiscal_calendar_445(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-4-5 fiscal calendar mapping: every order date lands in a
    fiscal year starting Feb 1, a 13-week quarter, and the 4-4-5
    period pattern (two 4-week months then a 5-week month) retailers
    close their books on — the calendar no date_trunc knows, derived
    entirely from integer day arithmetic (days-since-FY-start // 7,
    then the week's position inside its 13-week quarter; the 53rd
    week folds into week 51's period, the standard leap-week
    treatment).  fn_calendar_dim covers the Gregorian dimension; this
    is the fiscal overlay, rolled up to prove every period populates.

    Scale (100 TB): pure projection (codegen, no shuffle) plus a
    |fy x 12| rollup with map-side combine."""
    o = load(spark, sf_dir, "orders")
    cents = (
        F.signum("o_totalprice") * ((F.abs(F.col("o_totalprice")) * 100 + 0.5).cast("long"))
    ).cast("long")
    fy = F.when(
        F.month("o_orderdate") >= 2, F.year("o_orderdate")
    ).otherwise(F.year("o_orderdate") - 1)
    base = o.select(cents.alias("cents"), fy.alias("fy"), "o_orderdate")
    fweek = F.least(
        F.lit(51),
        F.floor(
            F.datediff(
                "o_orderdate",
                F.make_date("fy", F.lit(2), F.lit(1)),
            )
            / 7
        ),
    )
    wk = base.select("cents", "fy", fweek.cast("long").alias("fweek"))
    return (
        wk.groupBy(
            F.col("fy").alias("fiscal_year"),
            ((F.col("fweek") / 13).cast("long") + 1).alias("fiscal_quarter"),
            (
                (F.col("fweek") / 13).cast("long") * 3
                + F.when(F.col("fweek") % 13 < 4, 1)
                .when(F.col("fweek") % 13 < 8, 2)
                .otherwise(3)
            ).alias("fiscal_period"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )


@register(
    "fn_slugify",
    oracle="""
    SELECT p_partkey,
           regexp_replace(
             regexp_replace(lower(p_name || ' ' || p_type),
                            '[^a-z0-9]+', '-', 'g'),
             '(^-)|(-$)', '', 'g') AS slug,
           length(regexp_replace(
             regexp_replace(lower(p_name || ' ' || p_type),
                            '[^a-z0-9]+', '-', 'g'),
             '(^-)|(-$)', '', 'g')) AS slug_len
    FROM part WHERE p_partkey % 7 = 0
    """,
)
def fn_slugify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL slug mint: product name+type lowercased, every non-
    alphanumeric RUN collapsed to one hyphen, edge hyphens trimmed —
    the id every catalog/CMS pipeline derives for URLs and S3 prefixes
    (fn_url parses URLs; this manufactures the path segment).  Run-
    collapsing ('+' on the class, not per-char replace) is what keeps
    'a , b' from becoming 'a---b'; DuckDB needs the explicit 'g' flag
    where Spark replaces globally by default — the regex-dialect trap
    this repo's oracle checklist calls out.

    Scale (100 TB): pure projection, whole-stage codegen, no
    shuffle."""
    p = load(spark, sf_dir, "part")
    raw = F.lower(F.concat(F.col("p_name"), F.lit(" "), F.col("p_type")))
    slug = F.regexp_replace(
        F.regexp_replace(raw, "[^a-z0-9]+", "-"), "(^-)|(-$)", ""
    )
    return p.filter(F.col("p_partkey") % 7 == 0).select(
        "p_partkey",
        slug.alias("slug"),
        F.length(slug).cast("long").alias("slug_len"),
    )


@register(
    "fn_label_encode",
    oracle="""
    WITH pd AS (
      SELECT o_orderpriority AS cat,
             DENSE_RANK() OVER (ORDER BY o_orderpriority) - 1 AS code
      FROM (SELECT DISTINCT o_orderpriority FROM orders)
    ),
    sd AS (
      SELECT o_orderstatus AS cat,
             DENSE_RANK() OVER (ORDER BY o_orderstatus) - 1 AS code
      FROM (SELECT DISTINCT o_orderstatus FROM orders)
    )
    SELECT o.o_orderkey, o.o_orderpriority, CAST(p.code AS BIGINT)
             AS priority_code,
           o.o_orderstatus, CAST(s.code AS BIGINT) AS status_code
    FROM orders o
    JOIN pd p ON p.cat = o.o_orderpriority
    JOIN sd s ON s.cat = o.o_orderstatus
    WHERE o.o_orderkey % 16 = 0
    """,
)
def fn_label_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal label encoding: each categorical column gets a dense
    0-based integer code assigned by LEXICOGRAPHIC category order —
    the deterministic convention that survives reruns and engines
    (fit-order or hash-order codes silently reshuffle between runs,
    poisoning any model trained on yesterday's encoding;
    fn_feature_hashing is the fixed-width alternative when the
    vocabulary is unbounded).  The code table is built once from the
    distinct set and joined back, never computed per row.

    Scale (100 TB): distinct collapses to the tiny category axis, the
    code assignment windows over that axis only, and the mapping
    broadcasts back over the fact scan — no fact-sized shuffle."""
    o = load(spark, sf_dir, "orders")

    def codes(col: str):
        return (
            o.select(F.col(col).alias("cat"))
            .distinct()
            .select(
                "cat",
                (F.dense_rank().over(Window.orderBy("cat")) - 1)
                .cast("long")
                .alias("code"),
            )
        )
    pd_ = codes("o_orderpriority")
    sd = codes("o_orderstatus")
    return (
        o.filter(F.col("o_orderkey") % 16 == 0)
        .join(
            F.broadcast(pd_.withColumnRenamed("code", "priority_code")),
            F.col("o_orderpriority") == pd_["cat"],
        )
        .drop("cat")
        .join(
            F.broadcast(sd.withColumnRenamed("code", "status_code")),
            F.col("o_orderstatus") == sd["cat"],
        )
        .drop("cat")
        .select(
            "o_orderkey",
            "o_orderpriority",
            "priority_code",
            "o_orderstatus",
            "status_code",
        )
    )


@register(
    "fn_one_hot_encode",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END
             AS seg_automobile,
           CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
             AS seg_building,
           CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END
             AS seg_furniture,
           CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END
             AS seg_household,
           CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END
             AS seg_machinery,
           CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE','BUILDING',
                'FURNITURE','HOUSEHOLD','MACHINERY') THEN 1 ELSE 0 END
             AS seg_other
    FROM customer WHERE c_custkey % 20 = 0
    """,
)
def fn_one_hot_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-hot encoding against a FROZEN category vocabulary (the five
    known market segments plus an explicit catch-all) — the schema-
    stable form: a pivot-derived one-hot grows columns whenever a new
    category appears upstream, breaking every downstream consumer,
    while a frozen vocabulary routes novelty into seg_other and keeps
    the contract fixed (fn_label_encode is the ordinal sibling;
    agg_pivot owns the dynamic-pivot use case).

    Scale (100 TB): pure projection — one CASE per vocabulary entry,
    whole-stage codegen, no shuffle, no distinct pass."""
    c = load(spark, sf_dir, "customer")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    cols = [
        F.when(F.col("c_mktsegment") == s, 1)
        .otherwise(0)
        .alias(f"seg_{s.lower()}")
        for s in segs
    ]
    other = (
        F.when(~F.col("c_mktsegment").isin(*segs), 1).otherwise(0).alias("seg_other")
    )
    return c.filter(F.col("c_custkey") % 20 == 0).select(
        "c_custkey", *cols, other
    )


@register(
    "fn_excel_serial_date",
    oracle="""
    SELECT o_orderkey,
           o_orderdate,
           CAST(datediff('day', DATE '1899-12-30', o_orderdate) AS BIGINT)
             AS excel_serial,
           DATE '1899-12-30'
             + CAST(datediff('day', DATE '1899-12-30', o_orderdate)
                    AS INTEGER) AS rt_date,
           CAST(datediff('day', DATE '1899-12-30', o_orderdate) % 7
                AS BIGINT) AS serial_mod7
    FROM orders WHERE o_orderkey % 64 = 0
    """,
)
def fn_excel_serial_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excel serial-date bridge: dates to the 1900 date-system serial
    number (days since 1899-12-30 — the epoch that silently encodes
    Excel's phantom 1900-02-29; post-Mar-1900 dates like this
    fixture's need no correction) and back — the conversion every
    spreadsheet ingest/export hits, made explicit instead of leaking
    into ad-hoc +25569 unix-day arithmetic.  Round-trip is part of
    the hashed result, so an off-by-one in either direction fails
    the gate.

    Scale (100 TB): pure integer projection, codegen, no shuffle."""
    o = load(spark, sf_dir, "orders")
    serial = F.datediff("o_orderdate", F.lit("1899-12-30").cast("date")).cast(
        "long"
    )
    return o.filter(F.col("o_orderkey") % 64 == 0).select(
        "o_orderkey",
        "o_orderdate",
        serial.alias("excel_serial"),
        F.date_add(F.lit("1899-12-30").cast("date"), serial.cast("int")).alias(
            "rt_date"
        ),
        (serial % 7).alias("serial_mod7"),
    )


@register(
    "fn_round_half_even",
    oracle="""
    WITH v AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      WHERE o_orderkey % 10 = 0
         OR CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100 = 50
    )
    SELECT o_orderkey, cents,
           cents // 100
             + CASE WHEN cents % 100 > 50 THEN 1
                    WHEN cents % 100 = 50 AND (cents // 100) % 2 = 1 THEN 1
                    ELSE 0 END AS dollars_half_even,
           (cents + 50) // 100 AS dollars_half_up,
           CASE WHEN cents % 100 = 50 AND (cents // 100) % 2 = 0
                THEN 1 ELSE 0 END AS policies_differ
    FROM v
    """,
)
def fn_round_half_even(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banker's rounding (IEEE round-half-even) vs round-half-up on
    money, as explicit integer arithmetic — the policy difference
    that moves real dollars at scale (half-up systematically inflates
    by half a unit per boundary case; accounting and IEEE both
    mandate half-even for that reason), surfaced per row with a
    policies_differ witness.  Neither engine's ROUND is trusted:
    DuckDB rounds half away from zero, Java/Spark's BROUND exists
    but the point is a portable integer formulation (q + carry
    rules on cents%100) that any engine reproduces bit-for-bit.
    The filter keeps EVERY exact-boundary row in scope at any SF so
    the differing class always populates.

    Scale (100 TB): pure integer projection, codegen, no shuffle."""
    o = load(spark, sf_dir, "orders")
    cents = (
        F.signum("o_totalprice") * ((F.abs(F.col("o_totalprice")) * 100 + 0.5).cast("long"))
    ).cast("long")
    v = o.select("o_orderkey", cents.alias("cents")).filter(
        (F.col("o_orderkey") % 10 == 0) | (F.col("cents") % 100 == 50)
    )
    q = F.floor(F.col("cents") / 100).cast("long")
    r = F.col("cents") % 100
    return v.select(
        "o_orderkey",
        "cents",
        (
            q
            + F.when(r > 50, 1)
            .when((r == 50) & (q % 2 == 1), 1)
            .otherwise(0)
        ).alias("dollars_half_even"),
        F.floor((F.col("cents") + 50) / 100).cast("long").alias("dollars_half_up"),
        F.when((r == 50) & (q % 2 == 0), 1).otherwise(0).alias("policies_differ"),
    )


@register(
    "fn_target_encode",
    oracle="""
    WITH gtot AS (
      SELECT SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) * 1.0
             / COUNT(*) AS p
      FROM orders
    ),
    prio AS (
      SELECT o_orderpriority AS cat,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM orders GROUP BY 1
    )
    SELECT o.o_orderkey, o.o_orderpriority,
           round((p2.k + 50 * g.p) / (p2.n + 50), 6) AS priority_encoded,
           round(p2.k * 1.0 / p2.n, 6) AS priority_raw_rate,
           round(g.p, 6) AS global_rate
    FROM orders o
    JOIN prio p2 ON p2.cat = o.o_orderpriority
    CROSS JOIN gtot g
    WHERE o.o_orderkey % 32 = 0
    """,
)
def fn_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target (mean) encoding: each category's completion
    rate shrunk toward the global rate with pseudo-count m=50 —
    enc = (k_c + m·p)/(n_c + m) — the feature-engineering standard
    for high-cardinality categoricals where one-hot explodes
    (fn_one_hot_encode) and ordinal codes lie about order
    (fn_label_encode); the smoothing is what stops rare categories
    from memorizing their own label.  Encodings come from exact
    per-category counts joined back as a broadcast dimension.  The
    leakage caveat is documented, not hidden: production fits the
    encoding on a train fold (sample_hash_split) and applies it
    here-style to the rest.

    Scale (100 TB): one grouped count to |categories| rows, one
    broadcast join over the fact scan — no per-row state."""
    o = load(spark, sf_dir, "orders")
    conv = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    glob = o.agg(
        (F.sum(conv) * F.lit(1.0) / F.count(F.lit(1))).alias("p")
    )
    prio = o.groupBy(F.col("o_orderpriority").alias("cat")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(conv).cast("long").alias("k"),
    )
    return (
        o.filter(F.col("o_orderkey") % 32 == 0)
        .join(F.broadcast(prio), F.col("o_orderpriority") == F.col("cat"))
        .crossJoin(F.broadcast(glob))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(
                (F.col("k") + 50 * F.col("p")) / (F.col("n") + 50), 6
            ).alias("priority_encoded"),
            F.round(F.col("k") * F.lit(1.0) / F.col("n"), 6).alias(
                "priority_raw_rate"
            ),
            F.round("p", 6).alias("global_rate"),
        )
    )


@register(
    "fn_iso_week_boundaries",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS cal_year,
           CAST(isoyear(o_orderdate) AS BIGINT) AS iso_year,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CASE WHEN EXTRACT(year FROM o_orderdate)
                     <> isoyear(o_orderdate) THEN 1 ELSE 0 END
             AS boundary_mismatch
    FROM orders
    WHERE ((EXTRACT(month FROM o_orderdate) = 12
            AND EXTRACT(day FROM o_orderdate) >= 26)
        OR (EXTRACT(month FROM o_orderdate) = 1
            AND EXTRACT(day FROM o_orderdate) <= 7))
      AND o_orderkey % 3 = 0
    """,
)
def fn_iso_week_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO week-date vs calendar-year disagreement at year boundaries:
    for order dates in the year-end/new-year window, the calendar
    year, ISO week-numbering year, and ISO week — with a flag for
    the rows where they DISAGREE (Dec 29-31 can belong to next
    year's week 1; Jan 1-3 to last year's week 52/53), the
    off-by-one that corrupts every 'week 1' report written with
    year(d) instead of yearofweek(d).  fn_fiscal_calendar_445
    replaces the calendar; this op audits the standard one.

    Scale (100 TB): pure projection with a pushed-down date-window
    predicate — codegen, no shuffle."""
    o = load(spark, sf_dir, "orders")
    iso_year = F.expr("extract(yearofweek FROM o_orderdate)").cast("long")
    return o.filter(
        (
            ((F.month("o_orderdate") == 12) & (F.dayofmonth("o_orderdate") >= 26))
            | ((F.month("o_orderdate") == 1) & (F.dayofmonth("o_orderdate") <= 7))
        )
        & (F.col("o_orderkey") % 3 == 0)
    ).select(
        "o_orderkey",
        "o_orderdate",
        F.year("o_orderdate").cast("long").alias("cal_year"),
        iso_year.alias("iso_year"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        F.when(F.year("o_orderdate").cast("long") != iso_year, 1)
        .otherwise(0)
        .alias("boundary_mismatch"),
    )


@register(
    "fn_checkdigit_ean13",
    oracle="""
    WITH base AS (
      SELECT p_partkey,
             lpad(CAST(400000000000 + p_partkey AS VARCHAR), 12, '0')
               AS body
      FROM part WHERE p_partkey % 11 = 0
    ),
    digits AS (
      SELECT p_partkey, body,
             CAST(SUM(CAST(substr(body, CAST(i.i AS BIGINT) + 1, 1)
                           AS BIGINT)
                      * CASE WHEN i.i % 2 = 0 THEN 1 ELSE 3 END)
                  AS BIGINT) AS wsum
      FROM base CROSS JOIN range(12) i(i)
      GROUP BY p_partkey, body
    )
    SELECT p_partkey,
           body || CAST((10 - wsum % 10) % 10 AS VARCHAR) AS ean13,
           CAST((10 - wsum % 10) % 10 AS BIGINT) AS check_digit
    FROM digits
    """,
)
def fn_checkdigit_ean13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAN-13/GTIN check-digit mint: 12-digit article bodies (GS1-ish
    prefix + part key) get their standard modulo-10 check digit —
    odd positions ×1, even ×3, complement to 10 — completing the
    identifier-integrity family (fn_luhn_check for cards,
    fn_iban_mod97 for accounts) with the barcode standard every
    retail/logistics feed validates on ingest.  The digit expansion
    is a positional substring fan-out with exact integer weights, no
    string-math tricks.

    Scale (100 TB): a 12-row broadcast fan-out per code folded
    map-side — effectively a projection."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 11 == 0)
    base = p.select(
        "p_partkey",
        F.lpad((F.lit(400000000000) + F.col("p_partkey")).cast("string"), 12, "0").alias(
            "body"
        ),
    )
    idx = spark.range(12).select(F.col("id").cast("int").alias("i"))
    digits = (
        base.crossJoin(F.broadcast(idx))
        .groupBy("p_partkey", "body")
        .agg(
            F.sum(
                F.substring(F.col("body"), F.col("i") + 1, 1).cast("long")
                * F.when(F.col("i") % 2 == 0, 1).otherwise(3)
            )
            .cast("long")
            .alias("wsum")
        )
    )
    cd = (10 - F.col("wsum") % 10) % 10
    return digits.select(
        "p_partkey",
        F.concat(F.col("body"), cd.cast("string")).alias("ean13"),
        cd.cast("long").alias("check_digit"),
    )


@register(
    "fn_largest_remainder_allocation",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM rev),
    quota AS (
      SELECT r.nation, r.cents,
             CAST(r.cents AS HUGEINT) * 100000000 // t.total AS floor_alloc,
             (CAST(r.cents AS HUGEINT) * 100000000) % t.total AS remainder
      FROM rev r CROSS JOIN tot t
    ),
    ranked AS (
      SELECT nation, cents,
             CAST(floor_alloc AS BIGINT) AS floor_alloc,
             ROW_NUMBER() OVER (ORDER BY remainder DESC, nation) AS rem_rank,
             CAST(100000000 - SUM(floor_alloc) OVER () AS BIGINT) AS leftover
      FROM quota
    )
    SELECT nation, cents, floor_alloc,
           CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END AS extra_cent,
           floor_alloc + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
             AS final_alloc
    FROM ranked
    """,
)
def fn_largest_remainder_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) allocation: split a 1,000,000.00
    budget across nations proportionally to revenue so the integer-cent
    pieces sum EXACTLY to the budget — floor every quota, then hand the
    leftover cents to the largest remainders (nation tie-break) — the
    penny-allocation algorithm behind invoice line rounding, seat
    apportionment, and budget splits, where naive per-row rounding
    drifts off the total (dq_penny_drift_audit detects that drift; this
    op prevents it).  Quotas multiply in HUGEINT/decimal so cents ×
    budget never overflows; every step is integer arithmetic.

    Scale (100 TB): shares collapse to the |groups| grid; the remainder
    rank and leftover are windows over that grid.  Allocating within
    millions of parent groups partitions the same windows by parent."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    cents = (
        F.signum("o_totalprice")
        * ((F.abs(F.col("o_totalprice")) * 100 + 0.5).cast("long"))
    ).cast("long")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(cents).cast("long").alias("cents"))
    )
    tot = rev.agg(F.sum("cents").cast("long").alias("total"))
    budget = F.lit(100000000).cast("decimal(38,0)")
    quota = rev.crossJoin(F.broadcast(tot)).select(
        "nation", "cents",
        (F.col("cents").cast("decimal(38,0)") * budget / F.col("total"))
        .cast("decimal(38,0)")
        .alias("_unused"),
        F.expr(
            "CAST((CAST(cents AS DECIMAL(38,0)) * 100000000) DIV total AS LONG)"
        ).alias("floor_alloc"),
        F.expr(
            "CAST((CAST(cents AS DECIMAL(38,0)) * 100000000) % total AS LONG)"
        ).alias("remainder"),
    ).drop("_unused")
    wall = Window.partitionBy()
    ranked = quota.select(
        "nation", "cents", "floor_alloc",
        F.row_number()
        .over(Window.orderBy(F.col("remainder").desc(), "nation"))
        .alias("rem_rank"),
        (F.lit(100000000) - F.sum("floor_alloc").over(wall))
        .cast("long")
        .alias("leftover"),
    )
    extra = F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
    return ranked.select(
        "nation", "cents", "floor_alloc",
        extra.alias("extra_cent"),
        (F.col("floor_alloc") + extra).alias("final_alloc"),
    )


@register(
    "fn_month_boundary_features",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS d,
           CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) - 1
             AS days_from_month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                CAST(date_trunc('month', o_orderdate) AS DATE)
                + INTERVAL 1 MONTH - INTERVAL 1 DAY) AS INTEGER)
             AS days_to_month_end,
           CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                     CAST(date_trunc('month', o_orderdate) AS DATE)
                     + INTERVAL 1 MONTH - INTERVAL 1 DAY) < 7
                THEN 1 ELSE 0 END AS is_month_end_week,
           CASE WHEN EXTRACT(day FROM o_orderdate) <= 7
                THEN 1 ELSE 0 END AS is_month_start_week
    FROM orders
    """,
)
def fn_month_boundary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-boundary calendar features: days from month start, days to
    month end, and start/end-week flags — the payday/close-of-books
    features every demand and payments model wants (fn_calendar_dim
    builds the full dimension; these are the four columns a feature
    pipeline projects inline without a join).  DuckDB's month-end needs
    the +1 MONTH −1 DAY idiom (its DATE+INTERVAL returns TIMESTAMP —
    compared as day diffs, not materialized as a date column) while
    Spark has last_day(); both produce identical integer day counts.

    Scale (100 TB): a pure narrow projection."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    to_end = F.datediff(F.last_day(d), d)
    return o.select(
        "o_orderkey",
        d.alias("d"),
        (F.dayofmonth(d) - 1).cast("int").alias("days_from_month_start"),
        to_end.cast("int").alias("days_to_month_end"),
        F.when(to_end < 7, 1).otherwise(0).alias("is_month_end_week"),
        F.when(F.dayofmonth(d) <= 7, 1).otherwise(0).alias("is_month_start_week"),
    )
