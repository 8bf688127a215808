"""[EXT] Pattern-mining and tokenizer-training queries: market-basket
association rules over the relational star schema, PMI collocation mining
over the document corpus, and distributed BPE merge learning — the
vocabulary-construction stage of an LLM data pipeline expressed as pure
DataFrame algebra.

Cross-engine determinism: all scores are exact-integer (milli-lift via
BIGINT cross-multiplication, PMI in floor-log2 bits via ``length(bin(x))-1``
— the ``doc_surprisal_score`` device); BPE merge application is a plain
``replace`` over a canonical ``||sym||sym||`` string form whose
non-overlapping left-to-right semantics are identical in Java and DuckDB
(verified by test_mining's overlap cases).

Scale stance (100 TB):

- basket pairs come from a self-join on the uniform order key — candidate
  count is sum(basket_size^2), bounded by the per-order line limit, never
  |lineitem|^2; item marginals broadcast.
- collocation pairs are built narrowly per row from the token array (the
  ``skipgram_pairs`` window device); marginal tables broadcast (Heaps' law).
- BPE learns from the (word, count) VOCABULARY table, not the raw corpus —
  the corpus is touched once to build it; each merge round is one uniform
  pair-keyed aggregation over the vocab plus a broadcast of the single
  winning pair. Rounds are data-independent plan steps (fixed K), so the
  whole learn is one lazy DAG with no driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.operators.textstats import TOKEN_RE
from amazon_kinesis_data_streams_health_check_spark.plans.registry import register
from amazon_kinesis_data_streams_health_check_spark.session import configure_session
from amazon_kinesis_data_streams_health_check_spark.sources.tables import parallel_scan

_SPARK_TOK = f"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)"
_DUCK_TOK = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"


# ---------------------------------------------------------------------------
# Market-basket lift: which parts co-occur in orders more than chance — the
# association-rule screen (support / lift) on the star schema. Lift is kept
# exact: lift = N * c_xy / (c_x * c_y) is emitted in integer milli-units via
# BIGINT cross-multiplication, and the "positive association" flag compares
# 1000 * N * c_xy > 1000 * c_x * c_y without ever dividing.
# ---------------------------------------------------------------------------
_BASKET_MIN_PAIR = 2

_BASKET_SQL = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
),
n AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_baskets FROM items),
marg AS (
  SELECT part, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY part
),
pairs AS (
  SELECT a.part AS part_a, b.part AS part_b,
         CAST(count(*) AS BIGINT) AS n_cooccur
  FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
  GROUP BY a.part, b.part
)
SELECT p.part_a, p.part_b, p.n_cooccur,
       ma.c AS n_a, mb.c AS n_b,
       CAST((1000 * n.n_baskets * p.n_cooccur) // (ma.c * mb.c) AS BIGINT)
         AS lift_milli,
       n.n_baskets * p.n_cooccur > ma.c * mb.c AS positive_assoc
FROM pairs p
JOIN marg ma ON ma.part = p.part_a
JOIN marg mb ON mb.part = p.part_b
CROSS JOIN n
WHERE p.n_cooccur >= {_BASKET_MIN_PAIR}
"""


@register(
    "market_basket_lift",
    oracle=_BASKET_SQL,
    doc="Association mining: part pairs co-occurring in >= 2 orders with "
    "exact integer milli-lift and a division-free positive-association "
    "flag (N*c_xy vs c_x*c_y cross-multiplication)",
    tags=("ext", "mining", "relational"),
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the pair join shuffles both sides once on the UNIFORM
    order key; candidates per order are C(basket,2) with basket bounded by
    TPC-H's 7-line order cap, so the join output is linear in |lineitem|.
    Pair counting shuffles on the uniform (part_a, part_b) key. The
    marginal table is |parts|-sized and BROADCASTS twice; the basket count
    is a broadcast scalar. Nothing ever pairs across orders."""
    configure_session(spark)
    li = parallel_scan(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    ).distinct()
    n = items.agg(F.countDistinct("okey").cast("long").alias("n_baskets"))
    marg = items.groupBy("part").agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.part") < F.col("b.part")))
        .groupBy(
            F.col("a.part").alias("part_a"), F.col("b.part").alias("part_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_cooccur"))
        .filter(F.col("n_cooccur") >= _BASKET_MIN_PAIR)
    )
    ma = marg.select(F.col("part").alias("part_a"), F.col("c").alias("n_a"))
    mb = marg.select(F.col("part").alias("part_b"), F.col("c").alias("n_b"))
    return (
        pairs.join(F.broadcast(ma), "part_a")
        .join(F.broadcast(mb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_cooccur",
            "n_a",
            "n_b",
            F.expr("(1000 * n_baskets * n_cooccur) div (n_a * n_b)")
            .cast("long")
            .alias("lift_milli"),
            (F.col("n_baskets") * F.col("n_cooccur") > F.col("n_a") * F.col("n_b")).alias(
                "positive_assoc"
            ),
        )
    )


# ---------------------------------------------------------------------------
# PMI collocations: directed (center -> context) token pairs within a +/-3
# window whose pointwise mutual information is positive — the classic
# collocation screen. PMI needs log(N*c_xy / (c_x*c_y)); cross-engine ln()
# differs in the last ulp, so the score is floor(log2(.)) bits over the
# EXACT integer ratio (length(bin(q))-1), restricted to ratio >= 2 (>= 1
# bit of association) — monotone in true PMI and bit-identical everywhere.
# ---------------------------------------------------------------------------
_PMI_WINDOW = 3
_PMI_MIN_PAIR = 3

_PMI_SQL = f"""
WITH base AS (
  SELECT {_DUCK_TOK} AS t FROM documents
),
prs AS (
  SELECT unnest(flatten(list_transform(range(1, len(t) + 1), i ->
           list_transform(range(i + 1, least(i + {_PMI_WINDOW}, len(t)) + 1), j ->
             t[i] || ' ' || t[j])))) AS pair
  FROM base WHERE len(t) >= 2
),
split AS (
  SELECT pair,
         string_split(pair, ' ')[1] AS center,
         string_split(pair, ' ')[2] AS context
  FROM prs
),
n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM split),
cc AS (
  SELECT center, CAST(count(*) AS BIGINT) AS c_center FROM split GROUP BY center
),
cx AS (
  SELECT context, CAST(count(*) AS BIGINT) AS c_context FROM split GROUP BY context
),
pc AS (
  SELECT center, context, CAST(count(*) AS BIGINT) AS n_pair
  FROM split GROUP BY center, context
)
SELECT pc.center, pc.context, pc.n_pair,
       cc.c_center, cx.c_context,
       CAST(length(bin((n.total * pc.n_pair) // (cc.c_center * cx.c_context)))
            - 1 AS BIGINT) AS pmi_bits
FROM pc
JOIN cc ON cc.center = pc.center
JOIN cx ON cx.context = pc.context
CROSS JOIN n
WHERE pc.n_pair >= {_PMI_MIN_PAIR}
  AND n.total * pc.n_pair >= 2 * cc.c_center * cx.c_context
"""


@register(
    "collocation_pmi",
    oracle=_PMI_SQL,
    doc=f"Collocation mining: directed token pairs within a +{_PMI_WINDOW} "
    "position window with >= 1 bit of pointwise mutual information, "
    "scored in exact floor-log2 bits over the integer probability ratio",
    tags=("ext", "corpus", "mining"),
)
def collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: pair construction is narrow array indexing per row (no
    positional self-join); pair counting shuffles once on the uniform
    (center, context) key; both marginal tables are vocabulary-sized and
    BROADCAST (Heaps' law — the hot 'the'-keys never concentrate on a
    reducer); the total is a broadcast scalar. The PMI itself is pure
    per-row integer arithmetic after the joins."""
    configure_session(spark)
    docs = parallel_scan(spark, sf_dir, "documents")
    pair_expr = (
        f"flatten(transform(sequence(1, size(t) - 1), i ->"
        f" transform(sequence(i + 1, least(i + {_PMI_WINDOW}, size(t))), j ->"
        f" concat(element_at(t, i), ' ', element_at(t, j)))))"
    )
    split = (
        docs.select(F.expr(_SPARK_TOK).alias("t"))
        .filter(F.size("t") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("pair"))
        .select(
            F.split("pair", " ").getItem(0).alias("center"),
            F.split("pair", " ").getItem(1).alias("context"),
        )
    )
    split = split.localCheckpoint(eager=False)  # feeds n, cc, cx AND pc
    n = split.agg(F.count(F.lit(1)).cast("long").alias("total"))
    cc = split.groupBy("center").agg(F.count(F.lit(1)).cast("long").alias("c_center"))
    cx = split.groupBy("context").agg(F.count(F.lit(1)).cast("long").alias("c_context"))
    pc = (
        split.groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= _PMI_MIN_PAIR)
    )
    return (
        pc.join(F.broadcast(cc), "center")
        .join(F.broadcast(cx), "context")
        .crossJoin(F.broadcast(n))
        .filter(
            F.col("total") * F.col("n_pair")
            >= 2 * F.col("c_center") * F.col("c_context")
        )
        .select(
            "center",
            "context",
            "n_pair",
            "c_center",
            "c_context",
            (
                F.length(
                    F.expr("bin((total * n_pair) div (c_center * c_context))")
                )
                - 1
            )
            .cast("long")
            .alias("pmi_bits"),
        )
    )


# ---------------------------------------------------------------------------
# BPE merge learning: the vocabulary-construction stage of tokenizer
# training, distributed. BPE learns from the (word, count) table — each
# round counts weighted adjacent symbol pairs, picks the most frequent pair
# (count desc, pair asc tie-break), and merges it everywhere. Words are kept
# in a canonical "||sym||sym||" string form so the merge is a single
# replace('|a||b|', '|ab|'): the pattern starts inside the left double
# separator and ends inside the right one, so consecutive pair occurrences
# never share consumed characters and plain non-overlapping left-to-right
# replace implements exactly the greedy BPE merge scan — identical
# semantics in Java and DuckDB (pinned by tests/test_mining.py).
# ---------------------------------------------------------------------------
_BPE_ROUNDS = 4
_BPE_EOW = "$"  # end-of-word symbol; outside TOKEN_RE's charset


def _duck_bpe_round(prev: str, rnd: int) -> str:
    """One DuckDB merge round: pair counts from vocab ``{prev}``, winner by
    (count desc, pair asc), merge applied via canonical-form replace."""
    return f"""
pairs_{rnd} AS (
  SELECT p.pair, CAST(sum(p.n) AS BIGINT) AS cnt
  FROM (
    SELECT unnest(list_transform(range(1, len(syms)),
             i -> syms[i] || '\x01' || syms[i + 1])) AS pair,
           n
    FROM (SELECT n, list_filter(string_split(w, '||'), s -> s <> '') AS syms
          FROM {prev}) v
    WHERE len(syms) >= 2
  ) p GROUP BY p.pair
),
best_{rnd} AS (
  SELECT pair, cnt,
         string_split(pair, '\x01')[1] AS a,
         string_split(pair, '\x01')[2] AS b
  FROM pairs_{rnd} ORDER BY cnt DESC, pair LIMIT 1
),
vocab_{rnd} AS (
  SELECT replace(v.w, '|' || b.a || '||' || b.b || '|', '|' || b.a || b.b || '|')
           AS w,
         v.n
  FROM {prev} v CROSS JOIN best_{rnd} b
)"""


_BPE_SQL = (
    f"""
WITH tok AS (
  SELECT unnest({_DUCK_TOK}) AS word FROM documents
),
vocab_0 AS (
  SELECT '||' || list_aggregate(
           list_transform(range(1, length(word) + 1), i -> word[i]), 'string_agg', '||')
         || '||{_BPE_EOW}||' AS w,
         CAST(count(*) AS BIGINT) AS n
  FROM tok GROUP BY word
),"""
    + ",".join(_duck_bpe_round(f"vocab_{r - 1}", r) for r in range(1, _BPE_ROUNDS + 1))
    + "\n"
    + "\nUNION ALL\n".join(
        f"""
SELECT CAST({r} AS BIGINT) AS merge_round,
       replace(b.pair, '\x01', ' ') AS merged_pair,
       b.cnt AS merge_count,
       (SELECT CAST(sum(n * (len(list_filter(string_split(w, '||'), s -> s <> ''))))
                    AS BIGINT)
        FROM vocab_{r}) AS n_symbols_after
FROM best_{r} b"""
        for r in range(1, _BPE_ROUNDS + 1)
    )
)


@register(
    "bpe_merge_learn",
    oracle=_BPE_SQL,
    doc=f"Tokenizer training: {_BPE_ROUNDS} rounds of distributed BPE merge "
    "learning over the corpus word-frequency table — weighted adjacent-pair "
    "counts, deterministic winner (count desc, pair asc), merge applied "
    "everywhere via canonical-form string replace; emits each round's "
    "winning pair, its count, and the weighted symbol total after the merge",
    tags=("ext", "corpus", "mining", "tokenizer"),
)
def bpe_merge_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the corpus is scanned ONCE to build the (word, count)
    vocabulary — everything after runs on the vocab table, which is orders
    of magnitude smaller (Heaps' law; this is how reference BPE trainers
    work too). Each round: one narrow pair-explode over the vocab, one
    uniform pair-keyed weighted count, a top-1 TakeOrdered (tiny), and the
    1-row winner BROADCAST back for a narrow replace pass. K rounds = K
    such steps in one lazy DAG; the vocab is localCheckpoint-pinned each
    round so Catalyst doesn't re-derive round r-1 for each of round r's
    three consumers. No driver-side collect anywhere."""
    configure_session(spark)
    docs = parallel_scan(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.expr(_SPARK_TOK)).alias("word"))
    vocab = tok.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("n"))
    # canonical "||c||c||...||$||" form
    vocab = vocab.select(
        F.concat(
            F.lit("||"),
            F.expr(
                "array_join(transform(sequence(1, length(word)),"
                " i -> substring(word, i, 1)), '||')"
            ),
            F.lit(f"||{_BPE_EOW}||"),
        ).alias("w"),
        "n",
    )
    syms = "filter(split(w, '[|][|]'), s -> s != '')"
    out_parts = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        vocab = vocab.localCheckpoint(eager=False)
        pairs = (
            vocab.select(F.expr(syms).alias("syms"), "n")
            .filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> concat(element_at(syms, i), '\x01',"
                        " element_at(syms, i + 1)))"
                    )
                ).alias("pair"),
                "n",
            )
            .groupBy("pair")
            .agg(F.sum("n").cast("long").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.desc("cnt"), "pair")
            .limit(1)
            .select(
                "pair",
                "cnt",
                F.split("pair", "\x01").getItem(0).alias("a"),
                F.split("pair", "\x01").getItem(1).alias("b"),
            )
        )
        best = best.localCheckpoint(eager=False)  # feeds vocab AND the output row
        vocab = vocab.crossJoin(F.broadcast(best)).select(
            F.expr(
                "replace(w, concat('|', a, '||', b, '|'),"
                " concat('|', a, b, '|'))"
            ).alias("w"),
            "n",
        )
        total = vocab.agg(
            F.sum(F.col("n") * F.size(F.expr(syms))).cast("long").alias("n_symbols_after")
        )
        out_parts.append(
            best.select(
                F.lit(rnd).cast("long").alias("merge_round"),
                F.expr("replace(pair, '\x01', ' ')").alias("merged_pair"),
                F.col("cnt").alias("merge_count"),
            ).crossJoin(F.broadcast(total))
        )
    out = out_parts[0]
    for part in out_parts[1:]:
        out = out.unionByName(part)
    return out
