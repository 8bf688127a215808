"""[EXT] Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

North-star training-data-pipeline scope (SURVEY.md section 2.10 E1) — no
reference citations. Design constraints:

- **Determinism across engines**: every hash is md5 (bit-identical in Spark
  and DuckDB); min-hash signatures are lexicographic minima over md5 hex
  strings, so no engine-specific hash function leaks into results.
- **Scale**: the LSH path is the 100 TB design — per-doc signature work is
  narrow (codegen'd array exprs over the scan); the only shuffles are the
  band-key self-join (candidates ~ linear in corpus for reasonable band
  widths) and the pair-verification joins. Brute-force all-pairs never
  happens. Banding keys are md5s => uniformly distributed join keys; skew
  only arises from genuinely giant duplicate classes — the band self-joins
  are therefore salted (``BAND_SALT``): the smaller-id side of each pair
  takes one of ``salt`` deterministic buckets, the other side replicates to
  all buckets, so one m-doc duplicate class generates its m^2 candidates
  across ``salt`` reducers instead of one. The pair set is bit-identical
  with or without salt (each a<b pair matches exactly once, in a's bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.operators.textstats import TOKEN_RE

#: MinHash configuration: 12 permutations in 4 bands of 3 rows.
#: P(candidate) = 1 - (1 - J^3)^4 — the classic S-curve centered near J~0.6.
MINHASH_PERMS = 12
LSH_BANDS = 4
LSH_ROWS = MINHASH_PERMS // LSH_BANDS

#: SimHash: 64-bit fingerprints in 8 bands of 8 bits, candidate keys = CONCATENATED
#: BAND PAIRS (C(8,2) = 28 sixteen-bit composite keys per doc) — the Manku
#: et al. 2007 (WWW, "Detecting near-duplicate web pages") block-permutation
#: design. The round-5 config (32-bit sigs, 4 single bands of 8 bits) had a
#: 256-value key space per band: every bucket saturates as the corpus grows
#: and candidate generation goes quadratic (measured: dedup_fuzzy_edit grew
#: at exponent 1.5 across a REAL sf0.1 -> sf1.0 step). 16-bit composite
#: keys give 65536 values per table, pushing the saturation point out 256x
#: while KEEPING recall: Hamming <= 6 flips at most 6 of the 8 bands, so at
#: least one of the 28 band PAIRS survives intact (pigeonhole on 2-of-8).
SIMHASH_BITS = 64
SIMHASH_BANDS = 8
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS

#: WIDE signature width for the fuzzy/verified dedup family (round-8, the
#: sf100 third-decade fix): md5 yields exactly 128 independent bits, so the
#: signature can widen to 128 with no extra hashing. Keeping the SAME 8-band
#: structure widens each band 8 -> 16 bits: band-pair keys go 16 -> 32 bits
#: (28 tables) and band-triple keys 24 -> 48 bits (56 tables) — Manku's
#: key-width law satisfied through ~2^24 docs (b=2, 8 bits of headroom) and
#: ~2^40 docs (b=3) where the 64-bit family's 24-bit keys saturated at 5M
#: (measured: the sf100 tier run crashed on chance collisions ~56*n^2/2^24).
#: The pigeonhole guarantee is per-BAND, so the lossless Hamming gates are
#: unchanged (<= 8 - b); a fixed gate over twice the bits is an angularly
#: tighter blocking threshold — an explicit recall/cost trade measured on
#: data by fuzzy_blocking_recall, never assumed.
SIMHASH_WIDE_BITS = 128

#: With composite 2-of-B band keys, any pair within Hamming distance B-2
#: leaves at least two bands untouched (pigeonhole) — their pair key is an
#: exact candidate match, so banding is lossless at this threshold.
#: Measured on the driver corpus: Levenshtein-verified near-dup pairs sit
#: at 64-bit Hamming <= 6 for 23/25 pairs (<= 3 caught only half) — use
#: this as the CANDIDATE bound for pipelines with a downstream exact
#: verify (dedup_fuzzy_edit).
SIMHASH_MAX_HAMMING = SIMHASH_BANDS - 2

#: Reporting threshold for unverified SimHash dedup (dedup_simhash):
#: Manku et al.'s production setting (k = 3 on 64-bit fingerprints).
#: Hamming <= 6 without a verify returns a quadratically-growing "vaguely
#: similar" mass on dense corpora (measured: output exponent 2.8 across
#: sf0.1 -> sf1.0); <= 3 is the published near-DUPLICATE operating point.
SIMHASH_REPORT_HAMMING = 3

#: Salt width for the band self-joins: caps per-reducer pair generation of a
#: giant duplicate class at ~m^2/BAND_SALT. 1 disables salting.
BAND_SALT = 8

#: A band key is "hot" (worth salting) when more docs than this share it —
#: 64 docs = ~4k pairs from one reducer unsalted, the break-even where the
#: y-side replication cost starts paying for itself. Everything colder joins
#: on bucket 0 with zero replication.
HOT_BAND_THRESHOLD = 64


def _salted_band_self_join(
    bands_long: DataFrame,
    id_col: str,
    extra_cols: tuple[str, ...] = (),
    salt: int = BAND_SALT,
    hot_threshold: int = HOT_BAND_THRESHOLD,
    cache_input: bool = True,
) -> DataFrame:
    """Self-join band rows on (band_idx, band_key) into (doc_a < doc_b) pairs,
    spreading each HOT band key over ``salt`` shuffle buckets.

    ``bands_long``: one row per (doc, band) with columns ``id_col, band_idx,
    band_key, *extra_cols``. Salting is adaptive (two-pass): a cheap count
    pass finds band keys shared by more than ``hot_threshold`` docs; only
    those are salted — the x (smaller-id) side takes a deterministic bucket
    from its doc id, the y side replicates to every bucket. Cold keys (the
    common path) join on bucket 0 with NO y-side replication — the round-2
    unconditional x``salt`` blowup is gone. Each true pair still matches
    exactly once (hot: in a's bucket; cold: in bucket 0), so the pair set is
    independent of both ``salt`` and ``hot_threshold``.
    Output: ``doc_a, doc_b`` plus ``<c>_a / <c>_b`` for each extra column.
    """
    x, y = bands_long, bands_long
    keys = ["band_idx", "band_key"]
    if salt > 1:
        # Pin the band rows once so the hot-count pass plus both join legs
        # don't re-derive the upstream chain three times — UNLESS the
        # caller pinned a narrower upstream itself (cache_input=False: the
        # SimHash paths checkpoint the n-row signature table and let the
        # ~140x-wider band explode recompute from it; materializing the
        # exploded band rows is what filled the disk at the sf100 tier).
        if cache_input:
            bands_long = bands_long.localCheckpoint(eager=False)
        hot = (
            bands_long.groupBy("band_idx", "band_key")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > hot_threshold)
            .select("band_idx", "band_key", F.lit(True).alias("_hot"))
        )
        x = bands_long.join(F.broadcast(hot), ["band_idx", "band_key"], "left").withColumn(
            "_salt",
            F.when(
                F.col("_hot").isNotNull(), F.pmod(F.hash(F.col(id_col)), F.lit(salt))
            ).otherwise(F.lit(0)),
        ).drop("_hot")
        y = bands_long.join(F.broadcast(hot), ["band_idx", "band_key"], "left").withColumn(
            "_salt",
            F.explode(
                F.when(
                    F.col("_hot").isNotNull(), F.sequence(F.lit(0), F.lit(salt - 1))
                ).otherwise(F.array(F.lit(0)))
            ),
        ).drop("_hot")
        keys.append("_salt")
    x, y = x.alias("x"), y.alias("y")
    cond = (F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
    for kcol in keys:
        cond &= F.col(f"x.{kcol}") == F.col(f"y.{kcol}")
    return (
        x.join(y, cond)
        .select(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
            *[F.col(f"x.{c}").alias(f"{c}_a") for c in extra_cols],
            *[F.col(f"y.{c}").alias(f"{c}_b") for c in extra_cols],
        )
        .distinct()
    )


def _tok(text_col: str) -> str:
    return f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)"


# ---------------------------------------------------------------------------
# SimHash vote arithmetic over md5 WORDS (round-9 optimization).
#
# Bit i of a token's md5 is bit (i % 4) of hex digit (i // 4). The original
# expressions re-derived that per bit with string ops
# (instr(HEX, substr(md5(tok), ...)) div 2^k % 2 — up to 128 substr+instr
# per token, and md5(tok) itself repeated unless codegen CSE catches it).
# Parsing the digest ONCE into four 32-bit integer words (8 hex chars each,
# so conv()'s unsigned value always fits a signed BIGINT exactly) turns
# every per-bit vote into a shiftright+AND — bit-identical values, integer
# cost. Word k holds hex digits 8k+1..8k+8 with digit 8k+1 most
# significant, so bit i lives in word i//32 at shift 4*(7 - (i//4) % 8)
# + i%4.
# ---------------------------------------------------------------------------
def _md5_word_cols(n_words: int) -> list[F.Column]:
    """w0..w{n-1}: consecutive 8-hex-char windows of md5(tok) as BIGINTs."""
    return [
        F.expr(f"cast(conv(substr(md5(tok), {8 * k + 1}, 8), 16, 10) as bigint)").alias(
            f"w{k}"
        )
        for k in range(n_words)
    ]


def _md5_bit(i: int) -> str:
    """SQL expr for bit i (0/1) of the parsed md5 words of one token."""
    shift = 4 * (7 - (i // 4) % 8) + (i % 4)
    return f"(shiftright(w{i // 4 // 8}, {shift}) & 1)"


def _simhash_raw_counts(
    df: DataFrame, text_col: str, id_col: str, bits: int
) -> DataFrame:
    """Per-doc token count ``nt`` and per-bit one-vote counts ``b_0..b_{bits-1}``
    (sum over tokens WITH multiplicity of md5-bit i). The signed vote of the
    original formulation is recoverable as v_i = 2*b_i - nt, so every
    signature below is bit-identical to the string-op original.

    Wide projections/aggregations are built as SQL STRINGS (one py4j call
    per column, parsed JVM-side) — building them as Column-object trees
    cost ~8 s of py4j round trips PER QUERY BUILD at bits=128 (measured:
    23k gateway messages for one dedup_fuzzy_edit plan)."""
    toks = df.select(
        F.col(id_col), F.explode(F.expr(_tok(text_col))).alias("tok")
    ).select(F.col(id_col), *_md5_word_cols(bits // 32))
    return toks.groupBy(id_col).agg(
        F.expr("count(1) as nt"),
        *[F.expr(f"sum({_md5_bit(i)}) as b_{i}") for i in range(bits)],
    )


def shingles_from_tokens(tok_col: str, n: int = 3) -> str:
    """Distinct word n-gram shingles over an ALREADY-TOKENIZED array column."""
    return (
        f"array_distinct(transform("
        f"sequence(1, greatest(size({tok_col}) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice({tok_col}, i, {n}))))"
    )


def shingles_expr(text_col: str = "text", n: int = 3) -> str:
    """Distinct word n-gram shingles as a Spark SQL expression.

    Prefer :func:`with_shingles` on DataFrames: this inline form embeds the
    tokenizer regex twice (size() and the slice lambda) and codegen does not
    CSE across the lambda boundary, so the regex re-runs per reference."""
    return shingles_from_tokens(_tok(text_col), n)


def with_shingles(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Round-9: tokenize ONCE into a projected column, then shingle from the
    token array — measured ~1.4x faster than the inline-regex expression on
    the sf0.1 corpus (CollapseProject keeps the two steps separate because
    the token array is referenced more than once)."""
    return (
        df.withColumn("_toks", F.expr(_tok(text_col)))
        .withColumn("sh", F.expr(shingles_from_tokens("_toks")))
        .drop("_toks")
    )


#: Corpus-size-adaptive MinHash banding (round-8, the cascade's sf100 fix).
#: Chance band-collision mass is ~bands * n^2 * Jbar^rows (Jbar = typical
#: cross-pair Jaccard), so ROWS must grow ~log n to keep candidates linear
#: — the lexical variant of Manku's key-width law, and exactly why FineWeb
#: ships (14 bands, 8 rows) at web scale while toy corpora run (4, 3).
#: The S-curve threshold J* = (1/b)^(1/r) stays roughly flat across the
#: ladder (0.63 / 0.69 / 0.72), so the semantic operating point drifts
#: mildly strict while chance collisions drop by Jbar^3 then Jbar^2 more.
#: Measured on the r07 sf100 tier: the fixed (4, 3) config's band keys over
#: the synthetic corpus's ~30k-shingle space saturated at 5M docs.
LSH_CONFIG_LADDER: tuple[tuple[int, int, int], ...] = (
    (1 << 16, LSH_BANDS, LSH_ROWS),  # <= 65k docs: (4, 3), J* ~ 0.63
    (1 << 22, 9, 6),  # <= 4.2M docs: J* ~ 0.69
    (1 << 62, 14, 8),  # beyond: FineWeb production, J* ~ 0.72
)


def lsh_config_for(n_docs: int) -> tuple[int, int]:
    """(bands, rows) for a corpus of ``n_docs`` documents."""
    for cap, bands, rows in LSH_CONFIG_LADDER:
        if n_docs <= cap:
            return bands, rows
    raise ValueError(f"corpus too large for the LSH ladder: {n_docs}")


def with_minhash(df: DataFrame, perms: int = MINHASH_PERMS) -> DataFrame:
    """mh_j = lexicographic min of md5('<j>|' || shingle) — one column per
    permutation. Narrow, codegen'd; no shuffle."""
    return df.withColumns(
        {
            f"mh_{j}": F.expr(f"array_min(transform(sh, s -> md5(concat('{j}|', s))))")
            for j in range(perms)
        }
    )


def with_bands(df: DataFrame, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> DataFrame:
    """band_b = md5(concat of that band's minhash rows)."""
    return df.withColumns(
        {
            f"band_{b}": F.expr(
                "md5(concat("
                + ", ".join(f"mh_{b * rows + r}" for r in range(rows))
                + "))"
            )
            for b in range(bands)
        }
    )


def lsh_candidate_pairs(
    banded: DataFrame,
    id_col: str = "doc_id",
    salt: int = BAND_SALT,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Docs sharing >=1 band -> distinct (doc_a < doc_b) candidate pairs.

    The self-join shuffles on (band_idx, band_key[, salt bucket]) —
    uniformly-distributed md5 keys, with the salt bounding the giant-
    duplicate-class hot key (see module docstring).
    """
    bands_long = banded.select(
        F.col(id_col),
        F.posexplode(F.array(*[F.col(f"band_{b}") for b in range(bands)])).alias(
            "band_idx", "band_key"
        ),
    )
    return _salted_band_self_join(bands_long, id_col, salt=salt)


def verified_jaccard(pairs: DataFrame, shingled: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Join shingle sets back onto candidate pairs and compute exact Jaccard."""
    a = shingled.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    b = shingled.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.expr("size(array_intersect(sh_a, sh_b))").cast("double")
                / F.expr("size(array_union(sh_a, sh_b))"),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Per-doc ``bits``-bit SimHash as a '0'/'1' string (64 or 128; md5 has
    exactly 128 bits to give).

    Bit i's vote is bit (i % 4) of md5(token)'s hex digit (i // 4), summed
    +1/-1 over tokens WITH multiplicity (explode -> groupBy: one shuffle on
    doc_id, partial-aggregated map-side). Round-9: votes ride the parsed
    md5 words (see _md5_word_cols) — sign(v_i) = sign(2*b_i - nt) — instead
    of 128 string ops per token; signatures are bit-identical.
    """
    raw = _simhash_raw_counts(df, text_col, id_col, bits)
    return raw.selectExpr(id_col, _sig_string_expr(_RAW_SIGN, bits) + " as sig")


def simhash_signatures_centered(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Per-doc ``bits``-bit CENTERED SimHash (round-7 sf10 tier fix): the raw
    majority-vote signature has corpus-level bit bias on low-entropy /
    boilerplate-heavy corpora (measured on the driver corpus: only 13/64
    bits balanced, ~40 bits effective entropy — band buckets saturate
    BROADLY and the band self-join goes quadratic no matter how wide the
    composite keys are). Centering subtracts the corpus-frequency-weighted
    drift per bit — all-integer:

        v'_i = F * v_i - n_tokens * S_i

    with F = total corpus token occurrences and S_i = the corpus-wide sum
    of per-occurrence +-1 votes for bit i (a 1-row broadcast). This is
    random-hyperplane LSH on MEAN-CENTERED term-frequency features —
    Charikar's construction with the feature mean removed — and restores
    near-uniform bits on ANY corpus (measured: 64/64 balanced, band-triple
    candidate mass down 570x). Corpus-dependent by design (two-pass);
    the raw :func:`simhash_signatures` stays the corpus-independent,
    streaming-friendly family default.
    """
    # Round-9 restructure: ONE pass over the token stream builds the per-doc
    # bit-count table ``raw`` (n_docs rows x bits+1 BIGINTs — pinned with a
    # lazy localCheckpoint), and the corpus drift folds from ``raw`` by
    # linearity (S_i = sum over docs of per-doc vote sums; F = sum of nt) —
    # the original's second full tokenize+explode scan is gone. The round-8
    # rule still holds: the EXPLODED token stream (O(corpus tokens)) is
    # never materialized — only the per-doc rollup is, which at 5M docs is
    # ~5 GB against the 250 GB token stream that filled the sf100 disk.
    # Sign identity: with b_i the one-vote count, r_i = 2*b_i - nt and
    # S_i = 2*B_i - F, so F*r_i - nt*S_i = 2*(F*b_i - nt*B_i) — the centered
    # bit below is bit-identical to the original (ties -> "0" either way).
    cv = _centered_counts(df, text_col, id_col, bits)
    return cv.selectExpr(id_col, _sig_string_expr(_CENTERED_SIGN, bits) + " as sig")


def _centered_counts(
    df: DataFrame, text_col: str, id_col: str, bits: int
) -> DataFrame:
    """raw per-doc bit counts x broadcast corpus drift — the shared input of
    both centered-signature forms (string and words)."""
    raw = _simhash_raw_counts(df, text_col, id_col, bits)
    raw = raw.localCheckpoint(eager=False)  # feeds the drift agg AND the signs
    drift = raw.agg(
        F.expr("sum(nt) as f0"),
        *[F.expr(f"sum(b_{i}) as s_{i}") for i in range(bits)],
    )
    return raw.crossJoin(F.broadcast(drift))


#: Per-bit sign predicates as SQL-string templates. _RAW_SIGN is the plain
#: majority vote (v_i = 2*b_i - nt > 0); _CENTERED_SIGN subtracts the
#: corpus-frequency drift (see simhash_signatures_centered). Both are the
#: algebraic halves of the original +-1 formulations — bit-identical.
_RAW_SIGN = "2 * b_{i} > nt"
_CENTERED_SIGN = "f0 * b_{i} - nt * s_{i} > 0"


def _sig_string_expr(sign_tpl: str, bits: int) -> str:
    """concat(CASE WHEN <sign_0> THEN '1' ELSE '0' END, ...) as ONE SQL
    string — built Python-side so the whole projection is a single py4j
    call instead of ~5 gateway round trips per bit."""
    return "concat(" + ", ".join(
        f"case when {sign_tpl.format(i=i)} then '1' else '0' end"
        for i in range(bits)
    ) + ")"


def _sign_word_exprs(sign_tpl: str, bits: int) -> list[str]:
    """Fold per-bit sign predicates into 32-bit signature words ``sw0..``
    (bit i of the signature = bit 31 - i%32 of word i//32, matching the
    MSB-first '0'/'1' string layout exactly). SQL strings, one per word."""
    exprs = []
    for k in range(bits // 32):
        terms = " + ".join(
            f"(case when {sign_tpl.format(i=32 * k + t)} then {1 << (31 - t)}L"
            " else 0L end)"
            for t in range(32)
        )
        exprs.append(f"cast(({terms}) as bigint) as sw{k}")
    return exprs


def simhash_words(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """:func:`simhash_signatures` as (id, sw0..sw{bits//32-1}) 32-bit words —
    the band/Hamming consumers' native form (round-9): no 128-char string is
    built or re-parsed, and every downstream band key / XOR-popcount works on
    the words directly. Bit-identical to the string signature."""
    raw = _simhash_raw_counts(df, text_col, id_col, bits)
    return raw.selectExpr(id_col, *_sign_word_exprs(_RAW_SIGN, bits))


def simhash_words_centered(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """:func:`simhash_signatures_centered` as 32-bit words — see
    :func:`simhash_words`. Same one-pass raw-counts + drift-by-linearity
    shape as the string builder; same bits."""
    cv = _centered_counts(df, text_col, id_col, bits)
    return cv.selectExpr(id_col, *_sign_word_exprs(_CENTERED_SIGN, bits))


def simhash_near_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = SIMHASH_MAX_HAMMING,
    salt: int = BAND_SALT,
    bands_per_key: int = 2,
    sig_bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Band-COMBO join (Manku et al. 2007) then exact Hamming filter.

    Each doc emits C(8, b) composite keys — one per unordered b-subset of
    the 8 bands of ``sig_bits / 8`` bits (b = ``bands_per_key``). Any pair
    within Hamming distance ``SIMHASH_BANDS - b`` flips bits in at most
    8 - b bands, leaving >= b bands equal, so the composite key of SOME
    b-subset matches exactly (pigeonhole) — banding is lossless up to that
    threshold, enforced below. The key-width/corpus-size law (the
    r06/r07/r08 tier lesson, and Manku's own design rule): composite keys
    must stay comfortably wider than log2(n) or every bucket saturates and
    the self-join goes quadratic — on 64-bit sigs, b = 2 (16-bit keys, 28
    tables) held to ~5*10^4 docs but measured exponent 1.26 at 5*10^5, and
    b = 3 (24-bit keys) saturated a decade later at 5*10^6; the 128-bit
    wide signature (``sig_bits = SIMHASH_WIDE_BITS``) doubles every key
    width at the SAME table counts (b=2 -> 32-bit keys to ~2^24 docs,
    b=3 -> 48-bit keys to ~2^40). Residual hot keys (empty docs,
    boilerplate) are handled by the salted join either way.
    """
    from itertools import combinations

    if max_hamming > SIMHASH_BANDS - bands_per_key:
        raise ValueError(
            f"banding with {bands_per_key} bands/key is only lossless to "
            f"Hamming {SIMHASH_BANDS - bands_per_key}, gate is {max_hamming}"
        )
    combos = list(combinations(range(SIMHASH_BANDS), bands_per_key))
    return _sig_banded_pairs(
        sigs, id_col, max_hamming, salt, combos, sig_bits // SIMHASH_BANDS, sig_bits
    )


def _sig_banded_pairs(
    sigs: DataFrame,
    id_col: str,
    max_hamming: int,
    salt: int,
    combos: list[tuple[int, ...]],
    band_bits: int,
    sig_bits: int,
) -> DataFrame:
    """Shared banded-pair pipeline over '0'/'1' signature strings.

    Scale shape (round-8 sf100 disk lesson, second iteration): the band
    explode carries ONLY (id, band_idx, 8-byte BIGINT key) — composite
    keys are <= 48 bits so conv(key, 2, 10) fits BIGINT exactly — so the
    self-join's two shuffle legs stay as narrow as possible (the first
    iteration shipped 4 signature words plus a 32-char string key per
    band row and filled a 250 GB disk at 5M docs x 140 keys). Signatures
    ride a pinned n-row table and are joined back onto the DISTINCT pair
    set (orders of magnitude smaller than the band rows) for the
    XOR+popcount Hamming verify.
    """
    n_words = sig_bits // 32
    # Round-9: parse the '0'/'1' signature string into 32-bit words ONCE and
    # pin the (id, sw0..sw{n-1}) table — narrower than the string it replaces
    # (8-16 BIGINTs' worth of bits vs a 64/128-char string), and every
    # downstream consumer (140-key band explode x2 join legs, the hot-key
    # count pass, the Hamming verify) now works in shiftright/AND integer
    # ops instead of re-running substr+conv string parses per band per leg.
    # Band keys keep the exact numeric value of the old
    # conv(concat(substr...), 2, 10) (bytes fold MSB-first), so the join
    # key space, salt behavior, and pair set are bit-identical.
    if "sw0" in sigs.columns:  # already in word form (simhash_words*)
        sigw = sigs.select(
            F.col(id_col), *[F.col(f"sw{w}") for w in range(n_words)]
        )
    else:
        sigw = sigs.select(
            F.col(id_col),
            *[
                F.expr(
                    f"cast(conv(substr(sig, {w * 32 + 1}, 32), 2, 10) as bigint)"
                ).alias(f"sw{w}")
                for w in range(n_words)
            ],
        )
    sigw = sigw.localCheckpoint(eager=False)

    mask = (1 << band_bits) - 1

    # Each band must lie within ONE 32-bit signature word: a band straddling
    # a word boundary would make the shiftright count below negative, and
    # Java shift semantics (count masked mod 64) would yield silently wrong
    # band keys (round-9 ADVICE). True for every current caller (band_bits
    # 8 or 16 divides 32) — enforced so a future config can't regress it.
    for combo in combos:
        for i in combo:
            o = i * band_bits
            if o % 32 + band_bits > 32:
                raise ValueError(
                    f"band {i} (band_bits={band_bits}) straddles a 32-bit "
                    f"signature word boundary; word-local extraction would "
                    f"be silently wrong"
                )

    def _band(i: int) -> str:
        """Band i (band_bits wide) extracted from the signature words."""
        o = i * band_bits
        return f"(shiftright(sw{o // 32}, {32 - o % 32 - band_bits}) & {mask})"

    def _key(combo: tuple[int, ...]) -> str:
        parts = [
            f"shiftleft({_band(i)}, {band_bits * (len(combo) - 1 - t)})"
            for t, i in enumerate(combo)
        ]
        return "cast((" + " + ".join(parts) + ") as bigint)"

    bands = sigw.selectExpr(
        id_col,
        "posexplode(array("
        + ", ".join(_key(combo) for combo in combos)
        + ")) as (band_idx, band_key)",
    )
    pairs = _salted_band_self_join(bands, id_col, salt=salt, cache_input=False)
    wa = sigw.select(
        F.col(id_col).alias("doc_a"),
        *[F.col(f"sw{w}").alias(f"sig_w{w}_a") for w in range(n_words)],
    )
    wb = sigw.select(
        F.col(id_col).alias("doc_b"),
        *[F.col(f"sw{w}").alias(f"sig_w{w}_b") for w in range(n_words)],
    )
    hamming = sum(
        (F.expr(f"bit_count(sig_w{w}_a ^ sig_w{w}_b)") for w in range(1, n_words)),
        F.expr("bit_count(sig_w0_a ^ sig_w0_b)"),
    )
    return (
        pairs.join(wa, "doc_a")
        .join(wb, "doc_b")
        .withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


#: Half-split wide banding (round-8, the sf100 fix for the fuzzy family).
#: The 128-bit signature is 16 bands of 8 bits in two halves of 8 bands.
#: Keys are 4-band combos WITHIN a half: C(8,4) * 2 = 140 tables of 32-bit
#: keys. Losslessness: h <= 9 dirty bits dirty at most 9 bands; split
#: across two halves, one half has <= 4 dirty bands (pigeonhole), so >= 4
#: of its 8 bands are clean and some 4-combo key matches exactly.
#: Generally: keys of k bands per half are lossless to 2*(8-k)+1.
#:
#: Why this shape and not plain C(8, b) combos over 8 wide bands: the gate
#: must SCALE with signature width to keep the same angular threshold
#: (measured on the driver corpus: true prefix-edit near-dup pairs sit at
#: 128-bit Hamming ~2x their 64-bit Hamming; a fixed <= 5 gate on 128 bits
#: drops blocking recall from 92% to 28%). Gate <= 9 on 128 bits ~= the
#: r07 production <= 5 on 64 bits (measured 80% vs 92% on the same truth
#: sample — the remaining loss is the high-mutation frontier that
#: fuzzy_blocking_recall keeps measured). Direct combos at gate 9 need
#: b <= 16 - 9 = 7 single-8-bit-band... any b-of-16 with b >= 4 costs
#: C(16, b) >= 1820 tables; the half-split covering gets 32-bit keys at
#: 140. An adversarial hitting-set bound shows ~(4/3)^9 ~= 13 tables is
#: the floor for 32-bit keys at this gate, so 140 structured tables is the
#: practical optimum an oracle-expressible design reaches.
SIMHASH_WIDE_BANDS = 16
SIMHASH_WIDE_BAND_BITS = SIMHASH_WIDE_BITS // SIMHASH_WIDE_BANDS
SIMHASH_WIDE_KEY_BANDS = 4
SIMHASH_WIDE_MAX_HAMMING = 2 * (SIMHASH_WIDE_BANDS // 2 - SIMHASH_WIDE_KEY_BANDS) + 1


def wide_band_combos() -> list[tuple[int, ...]]:
    """The 140 half-split band combos as absolute band indices (0..15):
    every 4-subset of bands 0..7, then every 4-subset of bands 8..15."""
    from itertools import combinations

    half = SIMHASH_WIDE_BANDS // 2
    return [
        tuple(h * half + i for i in combo)
        for h in range(2)
        for combo in combinations(range(half), SIMHASH_WIDE_KEY_BANDS)
    ]


def simhash_wide_near_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = SIMHASH_WIDE_MAX_HAMMING,
    salt: int = BAND_SALT,
) -> DataFrame:
    """Half-split banded self-join over 128-bit signatures, then exact
    Hamming filter — see the SIMHASH_WIDE_* block comment for the design.

    Scale shape: 140 keys/doc explode of bare (id, band_idx, BIGINT key)
    rows, salted band self-join on 32-bit uniformly-distributed keys
    (chance-collision mass ~140 * n^2 / 2^33 — single-digit thousands at
    5M docs where the 64-bit family's 24-bit keys generated ~8*10^7),
    then signatures joined back onto the distinct pair set for the
    XOR+popcount Hamming verify (see _sig_banded_pairs).
    """
    if max_hamming > SIMHASH_WIDE_MAX_HAMMING:
        raise ValueError(
            f"half-split wide banding is only lossless to Hamming "
            f"{SIMHASH_WIDE_MAX_HAMMING}, gate is {max_hamming}"
        )
    return _sig_banded_pairs(
        sigs,
        id_col,
        max_hamming,
        salt,
        wide_band_combos(),
        SIMHASH_WIDE_BAND_BITS,
        SIMHASH_WIDE_BITS,
    )


# ---------------------------------------------------------------------------
# DuckDB twin fragments.
# ---------------------------------------------------------------------------
def duck_shingles(text_col: str = "text", n: int = 3) -> str:
    t = f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}')"
    return (
        f"list_distinct([array_to_string(({t})[i:i+{n - 1}], ' ')"
        f" for i in range(1, greatest(len({t}) - {n - 1}, 1) + 1)])"
    )


def duck_minhash_cols(perms: int = MINHASH_PERMS) -> str:
    return ",\n         ".join(
        f"list_min(list_transform(sh, s -> md5('{j}|' || s))) AS mh_{j}"
        for j in range(perms)
    )


def duck_band_union(
    bands: int = LSH_BANDS, rows: int = LSH_ROWS, src: str = "mh"
) -> str:
    selects = []
    for b in range(bands):
        key = " || ".join(f"mh_{b * rows + r}" for r in range(rows))
        selects.append(
            f"SELECT doc_id, {b} AS band_idx, md5({key}) AS band_key FROM {src}"
        )
    return "\n  UNION ALL\n  ".join(selects)


# ---------------------------------------------------------------------------
# Exact all-pairs Jaccard join via lossless prefix filtering (AllPairs).
# ---------------------------------------------------------------------------
def jaccard_allpairs_pairs(
    docs: DataFrame,
    t_num: int = 1,
    t_den: int = 2,
    id_col: str = "doc_id",
    keep_sizes: bool = False,
) -> DataFrame:
    """All (doc_a < doc_b, jaccard) pairs with word-3-gram Jaccard
    >= t_num/t_den — EXACT (no LSH recall loss): shingles are ordered by
    global rarity, and any pair at the threshold must share a token inside
    both docs' prefixes of length n - ceil(t*n) + 1, so the prefix-token
    self-join (plus the AllPairs length filter) generates every qualifying
    candidate. See plans/ext_queries.dedup_jaccard_allpairs for the scale
    rationale and the brute-force DuckDB oracle that pins losslessness.
    """
    sh = with_shingles(docs).select(F.col(id_col).alias("doc_id"), "sh")
    sh = sh.localCheckpoint(eager=False)  # feeds freq, regroup, and verify
    exploded = sh.select("doc_id", F.explode("sh").alias("g"))
    freq = exploded.groupBy("g").agg(F.count(F.lit(1)).alias("f"))
    ranked = (
        exploded.join(freq, "g")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(f, g))), x -> x.g)"
            ).alias("osh")
        )
    )
    pfx = ranked.select(
        "doc_id",
        F.expr("size(osh)").alias("n"),
        F.expr(
            f"slice(osh, 1, size(osh) - (({t_num} * size(osh) + {t_den} - 1)"
            f" div {t_den}) + 1)"
        ).alias("pfx"),
    ).select("doc_id", "n", F.explode("pfx").alias("g"))
    cand = (
        pfx.alias("x")
        .join(
            pfx.alias("y"),
            (F.col("x.g") == F.col("y.g"))
            & (F.col("x.doc_id") < F.col("y.doc_id"))
            & (
                t_den * F.least(F.col("x.n"), F.col("y.n"))
                >= t_num * F.greatest(F.col("x.n"), F.col("y.n"))
            ),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("_i", F.expr("size(array_intersect(sh_a, sh_b))"))
        .withColumn("_u", F.expr("size(array_union(sh_a, sh_b))"))
        .filter(t_den * F.col("_i") >= t_num * F.col("_u"))
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("_i").cast("double") / F.col("_u"), 6).alias("jaccard"),
            *(
                [F.col("_i").alias("n_inter"), F.col("_u").alias("n_union")]
                if keep_sizes
                else []
            ),
        )
    )
