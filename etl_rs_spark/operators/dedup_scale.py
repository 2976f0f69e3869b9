"""Corpus-scale deduplication: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding near-dup.

The reference's dedup (SURVEY.md §2.11, operators/dedup.py here) is
record-linkage over business keys; a training-data pipeline also needs
*content* dedup over documents. Same architecture rules apply at 100 TB:

- blocking before pairing — candidate pairs come from equality joins on
  a bucket key (exact hash / LSH band bucket / blocking column), never
  from a cross join;
- symmetry breaking ``id_l < id_r`` on every pair join;
- all hashes are arithmetic mod p = 2^31-1 over a corpus-derived word-id
  vocabulary — deterministic across engines, so a SQL oracle can verify
  every stage bit-for-bit (no engine-private hash functions in results).

Shuffle budget per operator is noted in each docstring; everything is
native Column expressions (JVM-side; scalar chains codegen, the
higher-order array folds evaluate interpreted — which is why each
operator folds ALL its hashes in ONE pass and references computed
array columns a bounded number of times: Catalyst inlines a
projection's defining expression into every consumer reference, so an
n-reference consumer pays n recomputes of the md5 token map).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_rs_spark.operators.text import HASH_P, hash_params, words


def cap_group_size(
    df: DataFrame, cols: tuple[str, ...], cap: int | None
) -> DataFrame:
    """The shared skew guard of every blocking operator here: drop ALL
    rows of any ``cols`` group with more than ``cap`` members (an
    over-full block means the blocking key under-splits — pay bounded
    recall, never O(k^2) pairs). ``cap=None`` is a no-op. One window
    count over already-shuffled small rows."""
    if cap is None:
        return df
    w = Window.partitionBy(*cols)
    return (
        df.withColumn("_grpsize", F.count(F.lit(1)).over(w))
        .filter(F.col("_grpsize") <= cap)
        .drop("_grpsize")
    )


# ---------------------------------------------------------------------------
# exact dedup

def exact_dedup(
    df: DataFrame, content_cols: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: keep the min-id row per distinct content.

    One hash-partitioned aggregation (map-side partial min first), keyed
    by the content columns themselves. NULL contents form their own
    group (null-safe join — a plain equi semi-join would silently DROP
    every null-content row). For very wide content at scale, key the
    shuffle on a digest instead so only 32 bytes move —
    ``exact_dedup_digest`` below.
    """
    keep = df.groupBy(*content_cols).agg(F.min(id_col).alias(id_col))
    l, r = df.alias("l"), keep.alias("r")
    cond = F.col(f"l.`{id_col}`") == F.col(f"r.`{id_col}`")
    for c in content_cols:
        cond = cond & F.col(f"l.`{c}`").eqNullSafe(F.col(f"r.`{c}`"))
    return l.join(r, cond, "left_semi")


def exact_dedup_digest(
    df: DataFrame, content_cols: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup shuffling a sha2 digest instead of full content.
    Digest collisions are ignored (2^-128); survivors = min id per
    digest. The digest is over the JSON encoding of the content struct,
    which is unambiguous under NULLs, empty strings, and values that
    contain any would-be separator byte."""
    digest = F.sha2(
        F.to_json(F.struct(*[F.col(c) for c in content_cols])), 256
    )
    with_d = df.withColumn("_digest", digest)
    w = Window.partitionBy("_digest").orderBy(id_col)
    return (
        with_d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_digest", "_rn")
    )


def dedup_digest_stats(
    df: DataFrame, content_cols: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """(survivor id, n_copies) per distinct content in ONE digest-keyed
    aggregation: min(id) + count(*) grouped by sha2(content). Content
    never enters the shuffle — only the 64-hex digest moves — and the
    partial min/count combine map-side. This is the plan exact-dedup
    reporting should have at 100 TB (vs content-keyed groupBy + join)."""
    digest = F.sha2(
        F.to_json(F.struct(*[F.col(c) for c in content_cols])), 256
    )
    return (
        df.groupBy(digest.alias("_digest"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("_digest")
    )


# ---------------------------------------------------------------------------
# word -> id mapping for arithmetic hashing. Two paths:
#
# - word_hash60 / doc_word_ids_hashed: the SCALE path and the default
#   for every contract query. id = first 60 bits of md5(word) — no
#   vocab build, no join, no shuffle, and exactly reproducible in ANSI
#   SQL (DuckDB: ('0x' || substr(md5(w),1,15))::BIGINT), so the oracles
#   stay bit-exact. At 60 bits a 10^7-word vocabulary expects ~5e-5
#   collisions (vs ~2e4 under the old mod-2^31-1 residues) — exact-set
#   Jaccard is undistorted at web-scale vocabularies. Consumers that
#   need the universal-hash domain [0, p) (minhash, simhash, shingle
#   folds) reduce mod p INTERNALLY — their outputs are unchanged,
#   because (x mod p) of the 60-bit id equals the old mod-p id.
# - word_id_map / doc_word_ids: dense lexicographic-rank vocabulary.
#   Kept for tests that want ids in [1, |V|]; its rank window is a
#   single-partition global sort, so it must never appear in a scale
#   pipeline (test_plans.py gates contract queries against it).

def word_hash60(col: Column) -> Column:
    """Word -> bigint id in [0, 2^60): first 15 hex chars of
    md5(utf8(word)). Engine-portable: DuckDB computes the identical
    value with ``('0x' || substr(md5(w), 1, 15))::BIGINT``. Pure
    codegen expression — no vocab, no join, no shuffle."""
    return (
        F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 15), 16, 10)
        .cast("bigint")
    )


def word_hash(col: Column) -> Column:
    """The 60-bit id reduced to the universal-hash domain [0, p) —
    for callers that feed (a*x + b) mod p families directly."""
    return word_hash60(col) % F.lit(HASH_P)


def _mod_p(x: Column) -> Column:
    """Reduce a (possibly 60-bit) word id into the universal-hash
    domain. Keeps (a*x + b) products inside bigint: a < p ~ 2^31, so
    a * (x mod p) <= 2^62."""
    return x % F.lit(HASH_P)


def doc_word_ids_hashed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "word_ids",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Map each doc to its ordered array of 60-bit hashed word ids —
    the no-vocab scale path. A single narrow projection: zero shuffles,
    zero joins, embarrassingly parallel at any corpus size."""
    return df.select(
        id_col, *extra_cols, F.transform(words(text_col), word_hash60).alias(out_col)
    )


def word_id_map(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary: distinct word -> dense id by lexicographic rank.

    NOTE: the rank is a single-partition global sort over the distinct
    vocabulary — acceptable only for small-corpus fixtures that need
    dense ids. Scale pipelines use ``doc_word_ids_hashed`` (no vocab
    build at all); contract queries are plan-gated against this path.
    """
    distinct = df.select(F.explode(words(text_col)).alias("word")).distinct()
    w = Window.orderBy("word")
    return distinct.withColumn("word_id", F.row_number().over(w).cast("bigint"))


def doc_word_ids(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "word_ids",
) -> DataFrame:
    """Map each doc to its ordered array of word ids via explode ->
    broadcast vocab join -> re-assemble ordered by position."""
    tokens = df.select(
        id_col, F.posexplode(words(text_col)).alias("pos", "word")
    )
    mapped = tokens.join(F.broadcast(vocab), "word")
    return (
        mapped.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "word_id"))).alias("_pw"))
        .withColumn(out_col, F.col("_pw.word_id"))
        .drop("_pw")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH

def minhash_signature(
    word_ids: Column, n_hashes: int
) -> Column:
    """n_hashes universal hashes h_i(x) = (a_i*x + b_i) mod p; signature
    element i = min over the doc's distinct word ids.

    Computed as ONE fold over the distinct set (acc[i] = min(acc[i],
    h_i(x)) via zip_with) rather than n_hashes independent
    array_min(transform(...)) passes: the latter references the distinct
    array n times, and when ``word_ids`` is a computed projection (the
    hashed no-vocab path) Catalyst inlines its md5 token map into every
    reference — n full recomputes per row. Same arithmetic, same
    values."""
    distinct = F.array_distinct(word_ids)
    params = [hash_params(i) for i in range(n_hashes)]
    init = F.array_repeat(F.lit(HASH_P).cast("bigint"), n_hashes)

    def step(acc: Column, x: Column) -> Column:
        # reduce 60-bit ids into the hash domain first — values are
        # unchanged for ids already < p, and a * (x % p) stays in bigint
        hashes = F.array(*[(_mod_p(x) * a + b) % F.lit(HASH_P) for a, b in params])
        return F.zip_with(acc, hashes, lambda m, h: F.least(m, h))

    sig = F.aggregate(distinct, init, step)
    # empty word set -> null signature (matches the old per-element
    # array_min-of-empty semantics of "no signature")
    return F.when(F.size(distinct) > 0, sig)


#: polynomial base folding a band's signature slice into one bigint key
BAND_KEY_B = 31


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    word_ids_col: str = "word_ids",
    n_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.7,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH, verified by exact
    Jaccard over distinct word-id sets.

    Each band's signature slice is folded to ONE bigint key
    ``k = fold(k*31 + sig[i]) mod p`` — the band join shuffles a 16-byte
    (band, key) pair instead of a signature array, and the fold is
    replicable in ANSI SQL for the oracles. Fold collisions can only ADD
    candidates (verified next), never lose a true pair. Shuffles:
    (1) banded equi self-join on (band, key) — never a cross join;
    (2) distinct pairs join back to word-id sets for the exact verify.
    Returns (id_l, id_r, jaccard), id_l < id_r, jaccard rounded to
    6 decimals (cross-engine float parity) and >= threshold.

    ``max_bucket_size`` is the skew cap its simhash/embedding siblings
    carry: k exact-duplicate documents share identical signatures, so
    one (band, key) bucket holds k docs and the self-join pays k^2 —
    buckets over the cap are excluded from pairing (run exact dedup
    FIRST; a pair sharing only capped buckets is the documented recall
    trade)."""
    rows_per_band = n_hashes // bands
    sig = minhash_signature(F.col(word_ids_col), n_hashes)
    with_sig = docs.select(id_col, sig.alias("_sig"))

    def band_key(bi: int) -> Column:
        k = F.lit(0).cast("bigint")
        for j in range(rows_per_band):
            k = (k * BAND_KEY_B + F.col("_sig")[bi * rows_per_band + j]) % F.lit(HASH_P)
        return F.struct(F.lit(bi).alias("band"), k.alias("key"))

    banded = with_sig.select(
        id_col, F.explode(F.array(*[band_key(bi) for bi in range(bands)])).alias("_b")
    ).select(id_col, F.col("_b.band").alias("band"), F.col("_b.key").alias("key"))

    banded = cap_group_size(banded, ("band", "key"), max_bucket_size)

    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_l"), F.col(f"r.{id_col}").alias("id_r")
        )
        .distinct()
    )

    sets = docs.select(
        F.col(id_col), F.array_distinct(F.col(word_ids_col)).alias("_set")
    )
    verified = (
        cand.join(sets.withColumnsRenamed({id_col: "id_l", "_set": "_sl"}), "id_l")
        .join(sets.withColumnsRenamed({id_col: "id_r", "_set": "_sr"}), "id_r")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("_sl", "_sr")).cast("double")
                / F.size(F.array_union("_sl", "_sr")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_l", "id_r", "jaccard")
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash

def simhash(word_ids: Column, bits: int = 16) -> Column:
    """SimHash fingerprint over a doc's distinct word ids: bit j is set
    when the majority of word-hash bits h_j(x) mod 2 are 1. Returns the
    fingerprint as a bigint. Pure array algebra, no shuffle.

    One fold accumulates ALL per-bit votes (zip_with add of a ±1 array
    per word) instead of `bits` independent aggregate passes — the
    distinct array is referenced once, so the hashed no-vocab word-id
    expression isn't re-inlined per bit (see minhash_signature)."""
    distinct = F.array_distinct(word_ids)
    params = [hash_params(j) for j in range(bits)]
    zeros = F.array_repeat(F.lit(0).cast("bigint"), bits)

    def step(acc: Column, x: Column) -> Column:
        word_votes = F.array(
            *[
                F.when(((_mod_p(x) * a + b) % F.lit(HASH_P)) % 2 == 1, F.lit(1))
                .otherwise(F.lit(-1))
                .cast("bigint")
                for a, b in params
            ]
        )
        return F.zip_with(acc, word_votes, lambda v, w: v + w)

    votes = F.aggregate(distinct, zeros, step)
    powers = F.array(*[F.lit(2 ** j).cast("bigint") for j in range(bits)])
    bits_set = F.zip_with(
        votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("bigint"))
    )
    return F.aggregate(bits_set, F.lit(0).cast("bigint"), lambda a, x: a + x)


def auto_simhash_bits(
    n_docs: int,
    max_hamming: int = 2,
    target_bucket_size: int = 1024,
    min_band_bits: int = 5,
) -> int:
    """Fingerprint width that keeps band buckets from going quadratic
    as the corpus grows: with (max_hamming+1) pigeonhole bands, each
    band key must span ~n_docs/target_bucket_size distinct values, so
    band_bits = log2(n/target) and bits = n_bands * band_bits (capped
    at 62 so the fingerprint stays one non-negative bigint). A fixed
    16-bit fingerprint with max_hamming=2 gives 5-bit band keys = 32
    buckets — O(n^2/32) in-band pairs at any corpus size; this derives
    the width the same way auto_n_planes does for embedding LSH."""
    import math

    n_bands = max_hamming + 1
    band_bits = max(
        min_band_bits,
        math.ceil(math.log2(max(n_docs, 2) / target_bucket_size))
        if n_docs > target_bucket_size
        else min_band_bits,
    )
    band_bits = min(band_bits, 62 // n_bands)
    return n_bands * band_bits


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    word_ids_col: str = "word_ids",
    bits: int | None = None,
    max_hamming: int = 2,
    max_bucket_size: int | None = None,
    target_bucket_size: int = 1024,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Blocking: split the fingerprint into (max_hamming+1) bit-bands —
    by pigeonhole any pair within distance d agrees on >= 1 band, so an
    equi join per band finds all true pairs without a cross join.

    Scale controls (the same remedies as embedding_near_dup_pairs):
    ``bits=None`` derives the fingerprint width from the corpus size
    (auto_simhash_bits, one cheap count job) so band-bucket occupancy
    stays ~constant as the corpus grows; ``max_bucket_size`` excludes
    over-full (band, key) buckets from pairing entirely — bounded
    worst case under adversarial skew (a mega-bucket means the
    fingerprint under-splits; raise bits rather than pay O(k^2)). A
    pair sharing ONLY a capped band can be missed — the documented
    recall trade every web-scale dedup blocker makes.

    All bit algebra is shift/mask arithmetic (no doubles): exact up to
    the full 62-bit fingerprint a bigint can hold non-negatively.
    """
    if bits is None:
        bits = auto_simhash_bits(docs.count(), max_hamming, target_bucket_size)
    n_bands = max_hamming + 1
    band_bits = bits // n_bands
    fp = simhash(F.col(word_ids_col), bits)
    with_fp = docs.select(F.col(id_col), fp.alias("_fp"))

    # top bits beyond n_bands*band_bits (bits not divisible by n_bands)
    # join no band: the pigeonhole guarantee is unaffected — differing
    # uncovered bits leave every band key untouched, so a <=max_hamming
    # pair still agrees on >= 1 band.
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            (F.shiftright(F.col("_fp"), bi * band_bits)
             % F.lit(2 ** band_bits).cast("bigint")).alias("key"),
        )
        for bi in range(n_bands)
    ]
    banded = with_fp.select(
        id_col, "_fp", F.explode(F.array(*band_structs)).alias("_b")
    ).select(id_col, "_fp", F.col("_b.band").alias("band"), F.col("_b.key").alias("key"))

    banded = cap_group_size(banded, ("band", "key"), max_bucket_size)

    l, r = banded.alias("l"), banded.alias("r")
    hamming = _popcount_bigint(F.col("l._fp").bitwiseXOR(F.col("r._fp")))
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_l"),
            F.col(f"r.{id_col}").alias("id_r"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def _popcount_bigint(col: Column) -> Column:
    """Popcount via the JVM's Long.bitCount — exact for the full 62-bit
    fingerprint range (the old pow(2, j) double division broke above
    2^53) and whole-stage-codegen'd, not an interpreted array fold."""
    return F.bit_count(col).cast("int")


# ---------------------------------------------------------------------------
# n-gram Jaccard (shingle-level, order-sensitive within the shingle)

def ngram_shingles(word_ids: Column, n: int = 3) -> Column:
    """Word n-gram shingles, each reduced to a single bigint by the
    polynomial (((w1*B + w2)*B + w3) mod p with B=1_000_003.

    Implemented as n shifted slices folded with zip_with rather than
    element_at(word_ids, i+j) random access: when ``word_ids`` is a
    computed projection (the hashed no-vocab path), Catalyst inlines its
    defining expression into every consumer reference — per-index access
    re-evaluates the whole md5 token map per shingle per offset (~150x
    blowup measured); the slice/zip form references the array exactly n
    times. greatest(m, 0) guards k < n (Spark's sequence(1, 0) steps
    BACKWARDS, and a negative slice length errors under ANSI).

    60-bit word ids are safe here without pre-reduction: acc < p ~2^31,
    so acc*B + w <= 2^51 + 2^60 stays in bigint, and (acc*B + w) mod p
    equals (acc*B + (w mod p)) mod p — shingle values are identical to
    the old mod-p-id pipeline."""
    B = 1_000_003
    m = F.size(word_ids) - (n - 1)
    slices = [
        F.slice(word_ids, j + 1, F.greatest(m, F.lit(0))) for j in range(n)
    ]
    acc = F.transform(slices[0], lambda x: x % F.lit(HASH_P))
    for j in range(1, n):
        acc = F.zip_with(acc, slices[j], lambda a, w: (a * B + w) % F.lit(HASH_P))
    return F.array_distinct(acc)


def ngram_jaccard_pairs(
    docs: DataFrame,
    blocking_col: str,
    id_col: str = "doc_id",
    word_ids_col: str = "word_ids",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """n-gram Jaccard pairs within blocking groups via an inverted
    index (sparse similarity join).

    Instead of generating every in-block pair and intersecting shingle
    arrays (O(k^2) pairs x O(s) intersect), explode shingles into
    postings and equi-join on (block, shingle): only pairs that share
    >= 1 shingle are ever materialized, and |intersection| falls out of
    a count per pair. |union| = |A| + |B| - |inter|. Identical result
    set (a pair sharing zero shingles has jaccard 0 < threshold), but
    the shuffle key is the shingle — the plan a similarity join should
    have at 100 TB. Blocking (e.g. lang) stays in the join key.

    ``max_doc_freq`` is the stop-shingle rule of web-scale dedup: a
    boilerplate shingle shared by k documents (license headers, nav
    chrome) contributes k^2 rows to the postings self-join, so postings
    whose per-(block, shingle) document frequency exceeds the cap are
    dropped BEFORE the join. The trade is bounded and one-sided:
    |intersection| can only shrink (denominators |A|, |B| are computed
    before the cut), so reported jaccard never inflates — a pair whose
    overlap is mostly stop-shingles may fall below threshold (recall
    loss on boilerplate-dominated pairs, the standard accepted loss);
    no false pairs are ever added."""
    sh = docs.select(
        F.col(id_col),
        F.col(blocking_col).alias("_blk"),
        ngram_shingles(F.col(word_ids_col), n).alias("_sh"),
    )
    # each posting carries its doc's shingle-set size: |A| and |B| then
    # fall out of the SAME pair aggregation (any_value of a per-doc
    # constant) instead of two extra join-backs to a sizes frame.
    # explode_OUTER, not explode: plain explode's implicit
    # `size(arr) > 0` filter gets pushed below the projection and
    # RE-EVALUATES the whole shingle expression at the scan (verified
    # in the physical plan) — outer + isnotnull keeps one evaluation
    # per side and drops the same empty-shingle docs.
    postings = sh.select(
        F.col(id_col), "_blk", F.size("_sh").alias("_n"),
        F.explode_outer("_sh").alias("_s"),
    ).filter(F.col("_s").isNotNull())
    # document frequency per (block, shingle) — shingles are distinct
    # per doc, so the group count IS the df
    postings = cap_group_size(postings, ("_blk", "_s"), max_doc_freq)
    l, r = postings.alias("l"), postings.alias("r")
    return (
        l.join(
            r,
            (F.col("l._s") == F.col("r._s"))
            & (F.col("l._blk") == F.col("r._blk"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .groupBy(
            F.col(f"l.{id_col}").alias("id_l"), F.col(f"r.{id_col}").alias("id_r")
        )
        .agg(
            F.count(F.lit(1)).alias("_inter"),
            F.any_value(F.col("l._n")).alias("_nl"),
            F.any_value(F.col("r._n")).alias("_nr"),
        )
        .withColumn(
            "jaccard",
            F.col("_inter") / (F.col("_nl") + F.col("_nr") - F.col("_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_l", "id_r", "jaccard")
    )


# ---------------------------------------------------------------------------
# benchmark decontamination (training-corpus hygiene)

def decontaminate(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    word_ids_col: str = "word_ids",
    mode: str = "mark",
    max_probe_freq: int | None = None,
    broadcast_probes: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag (or drop) training documents that
    share word n-grams with an evaluation/benchmark probe set — the
    GPT-3-style n-gram decontamination pass every serious pretraining
    pipeline runs before training.

    A doc is contaminated when it contains >= ``min_overlap`` DISTINCT
    shingles (``ngram_shingles``, order-sensitive n-grams) that appear
    anywhere in ``probes``. ``mode="mark"`` returns every input doc row
    plus ``n_hits int`` (distinct probe shingles found in the doc) and
    ``contaminated boolean``; ``mode="filter"`` returns only the clean
    docs, columns unchanged.

    The 100 TB plan: the probe shingle set is the distinct union over
    the EVAL corpus — orders of magnitude smaller than the training
    corpus — so it is force-broadcast and the training side is never
    shuffled to find hits (one explode + BroadcastHashJoin at the
    scan). Matched postings (rare) aggregate per doc, and the hit
    counts join back as another small broadcast. The training corpus
    therefore crosses the wire zero times; the only wide exchange is
    over match rows. If the probe suite is itself huge (distinct
    shingles past executor memory), pass ``broadcast_probes=False`` to
    drop the hint and let the optimizer choose — a shingle-keyed
    shuffle join at real scale, same result either way (equivalence
    pinned in tests). ``max_probe_freq`` drops probe shingles that occur
    in more than that many probe docs first (boilerplate n-grams every
    doc contains would otherwise mark the whole corpus — recall-one-
    sided like q21's stop-shingle cap: dropping a probe shingle can
    only LOWER n_hits).
    """
    if mode not in ("mark", "filter"):
        raise ValueError(f"mode must be 'mark' or 'filter', got {mode!r}")
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1, got {min_overlap}")

    probe_post = probes.select(
        F.col(id_col),
        F.explode_outer(ngram_shingles(F.col(word_ids_col), n)).alias("_s"),
    ).filter(F.col("_s").isNotNull())
    probe_post = cap_group_size(probe_post, ("_s",), max_probe_freq)
    probe_sh = probe_post.select("_s").distinct()

    doc_post = docs.select(
        F.col(id_col),
        F.explode_outer(ngram_shingles(F.col(word_ids_col), n)).alias("_s"),
    ).filter(F.col("_s").isNotNull())
    # shingles are distinct per doc, so the match count IS the number
    # of distinct probe shingles present
    probe_side = F.broadcast(probe_sh) if broadcast_probes else probe_sh
    hits = (
        doc_post.join(probe_side, "_s")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("n_hits"))
    )
    if mode == "filter":
        return docs.join(
            hits.filter(F.col("n_hits") >= min_overlap), id_col, "left_anti"
        )
    return (
        docs.join(hits, id_col, "left")
        .withColumn("n_hits", F.coalesce(F.col("n_hits"), F.lit(0)))
        .withColumn("contaminated", F.col("n_hits") >= min_overlap)
    )
