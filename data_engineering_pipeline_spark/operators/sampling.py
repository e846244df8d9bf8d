"""Deterministic sampling operators.

df.sample() is seed-stable only for a fixed partitioning — repartition
the input and the sample changes, which makes results irreproducible
across cluster sizes and unverifiable against an oracle. These
operators derive inclusion from the DATA (a multiplicative hash of the
row key), so the same rows are chosen on 1 executor or 1000, and an
external engine can reproduce the exact sample.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# LCG step constants (Numerical Recipes). The multiplier must keep
# (2^32 - 1 + key) * mult inside int64 — ANSI Spark and DuckDB both
# raise on bigint overflow rather than wrapping — which rules out the
# classic 2654435761 Knuth constant.
_MULT = 69069
_INC = 1
_MOD = 2**32


def key_hash(*keys: Column) -> Column:
    """Order-mixing integer hash of one or more integral key columns —
    exact int64 arithmetic, reproducible in any engine."""
    h = F.lit(0).cast("long")
    for k in keys:
        h = ((h + k.cast("long")) * _MULT + _INC) % _MOD
    return h


def mixed_key_hash(*keys: Column) -> Column:
    """key_hash folded through the sketch scramble — for ORDER-
    sensitive uses (shard order, training-order schedules).

    key_hash alone is ONE affine LCG fold: for contiguous ids the
    values are base + 69069*id with no wraparound until ~62k ids, so
    sorting by it reproduces ID ORDER and an epoch change shifts every
    value equally — "epoch-keyed shuffle order" that neither shuffles
    nor re-keys (r10 review, caught by the curriculum epoch test).
    Rate decisions (hash_sample, the rebalancers) only consume
    key_hash MOD small constants, where the affine structure is
    harmless and the simple form stays oracle-mirrored everywhere —
    those keep key_hash. Ordering consumes the VALUE, so it gets the
    two-round quadratic cross-mix the sketches use (_scrambled_u —
    nonlinear, so id-order and epoch-shift structure both break), at
    the cost of the longer (but already oracle-mirrored, see the HLL
    oracles) SQL mirror."""
    from data_engineering_pipeline_spark.operators.sketch import (
        _scrambled_u,
        int_residue_hash,
    )

    return _scrambled_u(int_residue_hash(key_hash(*keys)))


def hash_sample(df: DataFrame, rate_pct: int, *keys: Column) -> DataFrame:
    """Bernoulli-style deterministic sample: keep rows whose key hash
    lands in the first rate_pct of 100 buckets. Stateless and
    partitioning-independent — the corpus-subsampling primitive (e.g.
    'train on a reproducible 10% of the crawl').

    Scale: a narrow filter — no shuffle, fully pushed into the scan
    stage."""
    return df.filter(key_hash(*keys) % 100 < rate_pct)


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    rate_pct: int,
    *order_keys: Column,
) -> DataFrame:
    """Exact per-stratum sampling: ceil(rate_pct% of each stratum),
    rows chosen by hash order (deterministic, partitioning-independent).
    Guarantees every stratum is represented — what hash_sample cannot
    promise for rare strata — e.g. 'keep 1% per language, but never
    drop a language'.

    Scale: one shuffle on the strata columns for the window; per-row
    state is a row_number, so skewed strata stream through without
    materializing. (A giant stratum makes the window's sort the
    bottleneck — pre-aggregate per-stratum counts and hash_sample
    within strata instead when strata are few and huge.)"""
    w = Window.partitionBy(*strata).orderBy(key_hash(*order_keys), *order_keys)
    cnt = Window.partitionBy(*strata)
    # ceil(cnt * rate / 100) in exact integer arithmetic. Integer DIV,
    # not floor(/): long/long is IEEE double division, and above 2^53
    # (a 10^14-row stratum at rate 90) the quotient's double rounding
    # can move the cutoff — the exact trap mixture_rebalance documents
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__cnt", F.count(F.lit(1)).over(cnt))
        .withColumn(
            "__take", F.expr(f"(__cnt * {int(rate_pct)} + 99) DIV 100")
        )
        .filter(F.col("__rn") <= F.col("__take"))
        .drop("__rn", "__cnt", "__take")
    )


def mixture_rebalance(
    df: DataFrame, stratum_col: str, *keys: Column
) -> DataFrame:
    """Downsample every stratum to the size of the smallest one —
    the domain-mixing step of a training pipeline ("equal parts per
    language/source"), as a deterministic Bernoulli filter rather than
    an exact quota: stratum S keeps rows whose key hash lands under
    ppm(S) = floor(1e6 * min_count / count(S)) per-million buckets.
    Exact integer arithmetic end to end, partitioning-independent,
    oracle-reproducible; kept counts are binomially close to the target
    (an exact quota needs the per-stratum sort of stratified_sample).

    Scale: one partial-aggregated shuffle for the per-stratum counts;
    the counts (|strata| rows) broadcast back onto the corpus, so the
    data itself is filtered in place with NO shuffle — at 100 TB the
    corpus stream never repartitions. (Generalizing to arbitrary target
    weights = replace min_count with weight(S) * total.)"""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    floor_n = counts.agg(F.min("__n").alias("__min_n"))
    ppm = counts.join(F.broadcast(floor_n)).select(
        F.col(stratum_col).alias("__stratum"),
        # integer DIV, not `/`: long/long is IEEE double division in
        # Spark, and an exact-integer quotient can land at N - ulp and
        # truncate to N-1 — DuckDB's // would then disagree.
        F.expr("__min_n * 1000000 DIV __n").alias("__keep_ppm"),
    )
    # NULL-SAFE stratum match (r9 review): groupBy counts a NULL
    # stratum as its own group, but a plain equi-join never matches it
    # back — every null-stratum row silently vanished from the output
    # instead of being rebalanced as its own stratum
    return (
        df.join(
            F.broadcast(ppm),
            F.col(stratum_col).eqNullSafe(F.col("__stratum")),
        )
        .filter(key_hash(*keys) % 1_000_000 < F.col("__keep_ppm"))
        .drop("__stratum", "__keep_ppm")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    *keys: Column,
    resolution: int = 1_000_000,
) -> DataFrame:
    """Keep each row with probability equal to its weight in [0, 1] —
    quality-weighted corpus subsampling (the GPT-3-style trick: sample
    the crawl with probability proportional to the quality classifier's
    score, so low-quality text is down-weighted without a hard cut).

    Deterministic and partitioning-independent: the per-row uniform is
    key_hash(keys) % resolution / resolution, and the row survives iff
    u < weight. Same exact-int64 hash as hash_sample, so the keep set
    is reproducible in any engine; a narrow filter, no shuffle."""
    u = (key_hash(*keys) % resolution).cast("double") / F.lit(
        float(resolution)
    )
    return df.filter(u < F.col(weight_col))


def temperature_rebalance(
    df: DataFrame, stratum_col: str, alpha: float, *keys: Column
) -> DataFrame:
    """Temperature (alpha) sampling over strata — the multilingual
    rebalancing rule (XLM / mBERT style): target proportions q_S ∝
    p_S^alpha, realized as pure downsampling with
    keep_rate(S) = (n_min / n_S)^(1 - alpha) (largest stratum most
    downsampled; alpha=1 keeps everything, alpha=0 equalizes to the
    smallest stratum == mixture_rebalance). Same deterministic
    per-million hash filter and no-corpus-shuffle plan as
    mixture_rebalance.

    Cross-engine determinism: any alpha whose exponent 1 - alpha is a
    DYADIC rational k/2^m (0.5, 0.25, 0.75, 0.625, ...) computes the
    rate as an ordered product of iterated square roots — sqrt and
    multiply are IEEE-754 correctly rounded in both the JVM and every
    libm, so floor(rate * 1e6) is bit-identical in any engine and the
    sample is hash-gradable (see dyadic_pow). Non-dyadic alphas fall
    back to pow(), which is NOT guaranteed correctly rounded across
    libm implementations; a 1-ulp difference can flip floor(rate * 1e6)
    by one bucket, so hash-grade those only through a dyadic BRACKET
    check (dyadic_bracket), never directly."""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    floor_n = counts.agg(F.min("__n").alias("__min_n"))
    ratio = F.col("__min_n").cast("double") / F.col("__n").cast("double")
    dyadic = dyadic_pow(ratio, 1.0 - alpha)
    rate = dyadic if dyadic is not None else F.pow(ratio, F.lit(1.0 - alpha))
    ppm = counts.join(F.broadcast(floor_n)).select(
        F.col(stratum_col).alias("__stratum"),
        F.floor(rate * F.lit(1_000_000.0)).cast("long").alias("__keep_ppm"),
    )
    # null-safe stratum match — same fix as mixture_rebalance: a NULL
    # stratum is counted as a group and must be sampled at its own
    # rate, not silently dropped by the equi-join
    return (
        df.join(
            F.broadcast(ppm),
            F.col(stratum_col).eqNullSafe(F.col("__stratum")),
        )
        .filter(key_hash(*keys) % 1_000_000 < F.col("__keep_ppm"))
        .drop("__stratum", "__keep_ppm")
    )


def _dyadic_bits(exponent: float, max_depth: int) -> list[int] | None:
    """Binary-fraction digits of `exponent` in (0, 1]: the list of i
    with exponent = sum(2^-i), or None if the expansion does not
    terminate within max_depth bits (i.e. the exponent is not dyadic at
    this depth). Exact float arithmetic — every intermediate is a
    dyadic rational well inside double range, so `*2` and `-1` are
    exact."""
    if not (0.0 < exponent <= 1.0):
        return None
    if exponent == 1.0:
        return [0]  # x^1 = x: one factor at sqrt-depth 0
    bits, e = [], exponent
    for i in range(1, max_depth + 1):
        e *= 2.0
        if e >= 1.0:
            bits.append(i)
            e -= 1.0
        if e == 0.0:
            return bits
    return None


def dyadic_pow(
    x: Column, exponent: float, max_depth: int = 8
) -> Column | None:
    """x^exponent for x in [0, 1] as an ordered product of iterated
    square roots, when `exponent` is a dyadic rational k/2^m with
    m <= max_depth: x^(1/2) = sqrt(x), x^(3/4) = sqrt(x)*sqrt(sqrt(x)),
    and in general one sqrt-tower factor per set bit of the binary
    fraction, multiplied left-to-right in increasing-depth order.

    Why this exists: IEEE 754 requires sqrt and multiply to be
    correctly rounded, and both the JVM (Math.sqrt, double *) and every
    C libm honor that — so this expression produces the bit-identical
    double in Spark and in DuckDB, where pow() carries an
    implementation-defined few-ulp error that can flip a downstream
    floor(). This is what lets temperature sampling be hash-graded at
    alphas beyond 0.5. Returns None for non-dyadic exponents
    (exponent == 0 is the caller's trivial keep-everything case).

    Must stay in lockstep with dyadic_pow_sql: same factor set, same
    multiplication order."""
    bits = _dyadic_bits(exponent, max_depth)
    if bits is None:
        return None
    out = None
    tower, depth = x, 0
    for i in bits:
        while depth < i:
            tower = F.sqrt(tower)
            depth += 1
        out = tower if out is None else out * tower
    return out


def dyadic_pow_sql(x_sql: str, exponent: float, max_depth: int = 8) -> str:
    """The DuckDB-SQL twin of dyadic_pow — identical factor set and
    left-to-right multiplication order, so an oracle built from this
    string reproduces the Spark column bit-for-bit. Raises on
    non-dyadic exponents (an oracle must not silently fall back to
    pow)."""
    bits = _dyadic_bits(exponent, max_depth)
    if bits is None:
        raise ValueError(
            f"exponent {exponent} is not dyadic at depth {max_depth}"
        )
    factors = []
    for i in bits:
        f = x_sql
        for _ in range(i):
            f = f"sqrt({f})"
        factors.append(f)
    out = factors[0]
    for f in factors[1:]:
        out = f"({out} * {f})"
    return out


def dyadic_bracket(exponent: float, depth: int = 8) -> tuple[float, float]:
    """The tightest dyadic bracket [lo_exp, hi_exp] of width 2^-depth
    around a (typically non-dyadic) exponent: floor/ceil of
    exponent * 2^depth. For x in (0, 1], x^hi_exp <= x^exponent <=
    x^lo_exp, and both bound exponents are dyadic — so both bounds are
    computable bit-identically cross-engine via dyadic_pow, giving a
    DETERMINISTIC acceptance band for each engine's own pow() result
    (pow's few-ulp libm error is ~1e-16; the band is
    ~x^(lo) - x^(hi) ≈ 0.1-1% wide: ten orders of magnitude of slack
    for rounding, yet tight enough that any real implementation bug —
    wrong exponent, inverted ratio — lands far outside)."""
    scaled = exponent * (1 << depth)
    lo = math.floor(scaled) / (1 << depth)
    hi = math.ceil(scaled) / (1 << depth)
    return lo, hi


def bottom_k_sample(df: DataFrame, k: int, *keys: Column) -> DataFrame:
    """EXACTLY-k deterministic sample: the k rows with the smallest key
    hash (ties broken by the keys themselves). hash_sample gives an
    expected rate; this gives an exact size — 'pick exactly 10,000
    eval docs, reproducibly' — and is still partitioning-independent
    and oracle-reproducible (ORDER BY hash LIMIT k).

    Scale: orderBy+limit compiles to TakeOrderedAndProject — each task
    keeps a k-row heap and the driver merges task heaps; no global
    sort, no full shuffle. Keep k driver-friendly (<= millions); for
    billions use hash_sample to a rate first, then exact-k the
    survivors."""
    return df.orderBy(key_hash(*keys), *keys).limit(k)


def weighted_bottom_k_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    *keys: Column,
    max_weight: int = 64,
) -> DataFrame:
    """EXACTLY-k weighted sample without replacement, deterministic:
    each row draws max_over_j<=w(key_hash(key..., j)) as its ticket and
    the k largest tickets win. The max of w iid uniforms is distributed
    as u^(1/w) — precisely the Efraimidis-Spirakis (2006) weighted
    reservoir key — so inclusion probability scales with integer
    weight, with NO floating pow (the cross-engine trap): every ticket
    is exact int64 (LCG fold + one squaring mix — the fold alone is
    affine in j, see _mix), reproducible on any partitioning and in
    any engine.

    Weights are positive integers <= max_weight (quality tiers,
    dup-counts, small token buckets — the corpus-curation cases); the
    per-row cost is w hash evaluations via one explode, so max_weight
    bounds the blowup (guarded, not silent).

    Scale: the ticket is one map-side array expression (<= max_weight
    hash evaluations per row, no explode, no groupBy); the winner
    selection is a top-k heap (TakeOrderedAndProject) — no full sort,
    no shuffle at all before the k-row merge."""
    from pyspark.sql import functions as F  # noqa: F811

    w = F.col(weight_col).cast("long")
    guard = F.when(
        (w >= 1) & (w <= max_weight), w
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"weight out of [1, {max_weight}]: "),
                w.cast("string"),
            )
        )
    )
    def _mix(h):
        # key_hash is AFFINE in its last fold, so tickets for adjacent
        # j would be linearly spaced and max-of-w would not bias by
        # weight at all (caught by tests/test_sampling.py). One
        # squaring round breaks the linearity: g = h mod 2^31 keeps
        # g*g inside int64, (g*g + h) mod 2^32 scrambles uniformly.
        g = h % F.lit(2_147_483_648)
        return (g * g + h) % F.lit(4_294_967_296)

    ticket = F.array_max(
        F.transform(
            F.sequence(F.lit(1), guard),
            lambda j: _mix(key_hash(*keys, j)),
        )
    )
    return (
        df.withColumn("__ticket", ticket)
        .orderBy(F.desc("__ticket"), *keys)
        .limit(k)
        .drop("__ticket")
    )


def component_split_bucket(component: Column) -> Column:
    """A deterministic bucket in [0, 100) from an int64 component
    label: the KMV two-round quadratic cross-mix applied to the
    label's residues, folded to a percentage. Pure int64 arithmetic —
    reproducible in ANSI SQL — and scrambled enough that sequential
    min-id component labels spread uniformly across buckets."""
    from data_engineering_pipeline_spark.operators.sketch import (
        KMV_MOD1,
        KMV_MOD2,
        KMV_ROUNDS,
        KMV_SCRAMBLE1,
        KMV_SCRAMBLE2,
    )

    h1 = component % F.lit(KMV_MOD1)
    h2 = component % F.lit(KMV_MOD2)
    for _ in range(KMV_ROUNDS):
        h1, h2 = (
            (h1 * h1 + F.lit(KMV_SCRAMBLE1) * h1 + h2) % F.lit(KMV_MOD1),
            (h2 * h2 + F.lit(KMV_SCRAMBLE2) * h2 + h1) % F.lit(KMV_MOD2),
        )
    return (h1 * F.lit(KMV_MOD2) + h2) % F.lit(100)


def leakage_safe_split(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Train/val/test assignment that can NEVER leak a near-duplicate
    across splits: documents are grouped into connected components of
    the duplicate-pair graph, and the whole component is assigned to
    one split by a deterministic hash of its label. A random or
    per-document hash split puts ~2·p·(1-p) of every duplicate pair
    astride the train/eval boundary — the classic eval-contamination
    bug; splitting by component makes straddling structurally
    impossible (same component => same bucket => same split).

    Output: (id_col, component, bucket, split). Scale: components
    shuffle only the pair graph (operators/graph.py iterative
    min-label propagation); the bucket/split assignment is one
    map-side expression over the component table. Deterministic
    across runs and engines, so the split is stable as the corpus
    grows — only documents whose component changes can move."""
    from data_engineering_pipeline_spark.operators.graph import (
        connected_components,
    )

    comp = connected_components(
        ids, pairs, id_col=id_col, src_col=src_col, dst_col=dst_col
    )
    bucket = component_split_bucket(F.col("component"))
    split = (
        F.when(bucket < F.lit(train_pct), F.lit("train"))
        .when(bucket < F.lit(train_pct + val_pct), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return comp.select(
        id_col,
        "component",
        bucket.cast("long").alias("bucket"),
        split.alias("split"),
    )


def target_mixture_rebalance(
    df: DataFrame,
    stratum_col: str,
    weights: dict[str, int],
    *keys: Column,
) -> DataFrame:
    """Downsample to an ARBITRARY target mix — the actual training-mix
    spec ("30% en, 50% code, 20% rest") rather than equal parts
    (mixture_rebalance) or a temperature law (temperature_rebalance).

    `weights` maps stratum value -> integer target weight (any scale;
    only ratios matter). Strata absent from `weights` are DROPPED
    (weight 0). Downsampling-only: the achievable total is
    T = min_S floor-limited by n_S / w_S — the binding stratum keeps
    everything and every other stratum keeps ~T * w_S / n_S of its
    rows, so realized proportions match the target up to binomial
    noise. All arithmetic is exact int64 (keep_ppm(S) =
    n_bind * w_S * 1e6 DIV (w_bind * n_S), with the binding stratum
    chosen by exact cross-multiplied comparison — no float ratios),
    and the keep decision is the same deterministic per-row key hash
    as the other rebalancers: partitioning-independent,
    oracle-reproducible, and composable with the salted gates.

    Scale: one partial-aggregated count shuffle; the per-stratum rates
    (|weights| rows) compute driver-side from the bounded count list
    and broadcast back as a literal-free tiny join — the corpus
    itself is filtered in place with no shuffle."""
    # validate BEFORE the counts early-exit, so an invalid spec never
    # passes silently just because no stratum matched (r10, ADVICE)
    for s_, w in weights.items():
        if w <= 0:
            raise ValueError(f"weight for {s_!r} must be positive")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
        if r[0] in weights
    }
    if not counts:
        return df.filter(F.lit(False))
    # binding stratum: minimal n_S / w_S by exact cross-multiplication
    bind, bn, bw = None, None, None
    for s_, n in counts.items():
        w = weights[s_]
        if bind is None or n * bw < bn * w:  # n/w < bn/bw exactly
            bind, bn, bw = s_, n, w
    rows = [
        (s_, min(1_000_000, (bn * weights[s_] * 1_000_000) // (bw * n)))
        for s_, n in counts.items()
    ]
    spark = df.sparkSession
    # type the __stratum column from the FRAME's schema, not from the
    # first observed key — inferring from next(iter(counts)) picked
    # 'long' for a None/non-str first key and broke string strata with
    # a createDataFrame schema mismatch (r10, ADVICE)
    from pyspark.sql.types import LongType, StructField, StructType

    sfield = df.schema[stratum_col].dataType
    ppm = spark.createDataFrame(
        rows,
        StructType([
            StructField("__stratum", sfield, True),
            StructField("__keep_ppm", LongType(), False),
        ]),
    )
    return (
        df.join(
            F.broadcast(ppm),
            F.col(stratum_col).eqNullSafe(F.col("__stratum")),
        )
        .filter(key_hash(*keys) % 1_000_000 < F.col("__keep_ppm"))
        .drop("__stratum", "__keep_ppm")
    )

