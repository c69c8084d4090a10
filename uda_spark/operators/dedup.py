"""Deduplication operators for large-scale document corpora (north-star).

Scale design (100 TB corpus):
  * exact dedup — hash-groupBy on a digest of the content, never on the
    content itself: the shuffle moves 32-byte keys + doc ids, not bodies.
  * MinHash/LSH near-dup — per-doc signatures are computed map-side with
    higher-order functions (no Python, no shuffle); only (band, band-hash,
    doc_id) triples shuffle for the band join, and candidate verification
    re-joins the (small) candidate set back to the shingle arrays.
  * SimHash — one 64/32-bit integer per doc; near-dup = small Hamming
    distance, bucketed by signature prefix for the scale path.

Everything is deterministic and engine-portable (functions/portable.py),
so each operator has a DuckDB oracle in uda_spark/queries/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uda_spark.operators.sort import snapshot as _snapshot
from uda_spark.operators.sort import snapshot_lazy as _snapshot_lazy

from uda_spark import cache
from uda_spark.functions import portable
from uda_spark.plans import partitioning as PART


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per distinct content digest.

    groupBy(md5(content)) — the canonical exact-dedup shape: the exchange
    key is a fixed-width digest regardless of document size.
    """
    return (
        df.select(F.md5(F.col(content_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def with_shingles(df: DataFrame, text_col: str, k: int = 3) -> DataFrame:
    toks = portable.tokens(text_col, "spark")
    return df.withColumn("shingles", F.expr(portable.shingles(toks, k, "spark")))


# Arrow tokenize/shingle/signature kernels (guide §4.2) — the default.
# False falls back to the relational (HOF + explode + aggregate)
# formulation; the A/B harness and the parity tests flip this to prove
# both paths produce identical values.
USE_ARROW_TEXT_KERNELS = True

# When the map-only Arrow kernel feeds a persisted signature relation
# whose sset arrays are then joined twice (candidate verification), one
# explicit doc repartition before the persist replaces two downstream
# sset exchanges (the relational path gets that layout for free from
# its final aggregate).  Value-identical either way; flag exists for
# in-session A/B.
REPARTITION_KERNEL_SIGNATURES = True


def _arrow_text_kernel_ok(df: DataFrame, text_col: str, id_col: str) -> bool:
    """The Arrow tokenize kernels hard-code (long id, string text) Arrow
    output schemas; any other input types take the type-generic relational
    path so results (values AND schema) are identical either way."""
    from pyspark.sql.types import LongType, StringType

    try:
        return isinstance(df.schema[id_col].dataType, LongType) and isinstance(
            df.schema[text_col].dataType, StringType
        )
    except (KeyError, TypeError):
        return False


def _doc_shingler(k: int):
    """Tokenize+shingle one document — the Python twin of
    ``portable.tokens`` + ``portable.shingles``.

    Parity contract (tests/test_operators.py::test_arrow_shingle_parity):
    ``str.lower()`` must equal Spark's ``lower()`` and DuckDB's
    ``lower()`` over the corpus alphabet, and ``str.split(' ')`` equals
    Spark's ``split(_, ' ')`` (both keep empty strings, including
    leading/trailing).  Nested function on purpose: cloudpickle
    serializes it BY VALUE so Python workers never need ``uda_spark``
    importable (zero-install contract, same as the GEMM kernels in
    operators/similarity.py).
    """

    def shingle_set(text: str):
        toks = text.lower().split(" ")
        n = len(toks)
        if n >= k:
            return {" ".join(toks[i : i + k]) for i in range(n - k + 1)}
        return {" ".join(toks)}

    return shingle_set


def shingle_rows_arrow(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """(doc, s): one row per DISTINCT per-doc shingle — the Arrow-kernel
    replacement for ``with_shingles`` + ``explode(array_distinct(...))``.

    The shingle HOF (``transform(sequence(...), i -> array_join(slice(...``
    executes interpreted (CodegenFallback) per document; guide §4.2 moves
    that per-row work into one ``mapInArrow`` pass.  NULL texts raise —
    callers filter them first (the signature NULL contract lives there).
    Distinct-per-doc order: sorted (vs the explode path's array order),
    invisible downstream — every consumer treats (doc, s) as a set.
    """
    shingle_set = _doc_shingler(k)

    def gen(batches):
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_ids: list[int] = []
            out_s: list[str] = []
            for i, txt in zip(ids, texts):
                if txt is None:
                    raise ValueError(
                        "shingle kernel received NULL text — filter upstream"
                    )
                ss = sorted(shingle_set(txt))
                out_ids.extend([i] * len(ss))
                out_s.extend(ss)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids, pa.int64()), pa.array(out_s, pa.string())],
                names=["doc", "s"],
            )

    return df.select(
        F.col(id_col).alias("doc"), F.col(text_col).alias("_text")
    ).mapInArrow(gen, "doc long, s string")


def gram_hash_rows_arrow(
    df: DataFrame, text_col: str, id_col: str, k: int, counts: bool = False
) -> DataFrame:
    """(doc, gh[, c]): 60-bit portable gram hashes per document, computed
    in one map-only Arrow pass — the kernel replacement for
    ``explode(shingles) -> hash60 projection -> per-doc distinct/count``.

    A document's grams live entirely in its own row, so BOTH the per-doc
    distinct (``counts=False``; the decontaminate shape) and the per-doc
    occurrence count (``counts=True``; the dup-coverage shape) need no
    exchange at all.  Value parity with the relational formulation:

    - ``int(md5(g).hexdigest()[:15], 16)`` == Spark's
      ``conv(substring(md5(g),1,15),16,10)`` (same big-endian fold of
      the first 15 hex chars — see portable.hash60).
    - tokenize/shingle is the parity-tested ``_doc_shingler`` contract
      (``str.lower()``/``split(' ')`` == JVM ``lower()``/``split``).
    - NULL text mirrors the explode path exactly: shingles(NULL) is
      ``[NULL]``, md5(NULL) is NULL — one (doc, NULL gh[, c=1]) row.
    - collisions of two distinct grams within one doc merge into one gh
      in both paths (the relational path groups/distincts on gh too).
    """

    def gen(batches):
        from collections import Counter
        from hashlib import md5

        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_i: list[int] = []
            out_g: list = []
            out_c: list[int] = []
            for i, txt in zip(ids, texts):
                if txt is None:
                    out_i.append(i)
                    out_g.append(None)
                    out_c.append(1)
                    continue
                toks = txt.lower().split(" ")
                n = len(toks)
                if n >= k:
                    grams = [" ".join(toks[j : j + k]) for j in range(n - k + 1)]
                else:
                    grams = [" ".join(toks)]
                if counts:
                    cc = Counter(
                        int(md5(g.encode("utf-8")).hexdigest()[:15], 16)
                        for g in grams
                    )
                    for gh in sorted(cc):
                        out_i.append(i)
                        out_g.append(gh)
                        out_c.append(cc[gh])
                else:
                    ghs = sorted(
                        {
                            int(md5(g.encode("utf-8")).hexdigest()[:15], 16)
                            for g in grams
                        }
                    )
                    out_i.extend([i] * len(ghs))
                    out_g.extend(ghs)
            arrays = [pa.array(out_i, pa.int64()), pa.array(out_g, pa.int64())]
            names = ["doc", "gh"]
            if counts:
                arrays.append(pa.array(out_c, pa.int64()))
                names.append("c")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    schema = "doc long, gh long" + (", c long" if counts else "")
    return df.select(
        F.col(id_col).alias("doc"), F.col(text_col).alias("_text")
    ).mapInArrow(gen, schema)


def _minhash_grouped_arrow(
    df: DataFrame, text_col: str, id_col: str, n_hashes: int, k: int
) -> DataFrame:
    """Map-only MinHash: (doc, h0..h{n-1}, sset) computed per document
    inside one ``mapInArrow`` pass — no shingle explode, no md5
    projection rows, no hash-aggregate exchange (every doc's shingles
    live in its own row, so the per-doc MIN needs no shuffle at all).

    Value-identical to the relational ``_minhash_grouped``: same salted
    md5 family (md5(f"{salt}|{shingle}") over UTF-8 bytes, hex chunks of
    8), same bytewise min (ASCII hex, so Python ``min`` == UTF8String
    binary min), ``sset`` sorted instead of ``collect_set`` order (every
    consumer is order-insensitive: sizes and ``array_intersect`` only).
    """
    shingle_set = _doc_shingler(k)
    n_salts = n_hashes // 4

    def gen(batches):
        from hashlib import md5

        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            hcols: list[list[str]] = [[] for _ in range(4 * n_salts)]
            ssets: list[list[str]] = []
            for txt in texts:
                if txt is None:
                    raise ValueError(
                        "minhash kernel received NULL text — filter upstream"
                    )
                sl = sorted(shingle_set(txt))
                ssets.append(sl)
                raw = [s.encode("utf-8") for s in sl]
                h = 0
                for salt in range(n_salts):
                    pre = b"%d|" % salt
                    digs = [md5(pre + b).hexdigest() for b in raw]
                    for c in range(0, 32, 8):
                        hcols[h].append(min(d[c : c + 8] for d in digs))
                        h += 1
            arrays = [pa.array(ids, pa.int64())]
            names = ["doc"]
            for i, col in enumerate(hcols):
                arrays.append(pa.array(col, pa.string()))
                names.append(f"h{i}")
            arrays.append(pa.array(ssets, pa.list_(pa.string())))
            names.append("sset")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    schema = (
        "doc long, "
        + ", ".join(f"h{i} string" for i in range(n_hashes))
        + ", sset array<string>"
    )
    return df.select(
        F.col(id_col).alias("doc"), F.col(text_col).alias("_text")
    ).mapInArrow(gen, schema)


def _minhash_grouped(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int,
    k: int,
    shingle_rows: DataFrame | None = None,
) -> DataFrame:
    """(doc, h0..h{n-1}, sset): per-doc MinHash values as COLUMNS plus the
    distinct shingle set — the whole-stage-codegen formulation.

    Shingles explode to rows; each row computes ``n_hashes/4`` md5s as
    plain (codegen'd) expressions; a single hash aggregate takes
    ``n_hashes`` string MINs.  This replaces the higher-order-function
    formulation (aggregate/transform lambdas), which Spark executes in
    interpreted mode (CodegenFallback) — measured 2.7x slower at sf0.1.
    MinHash over distinct shingles equals MinHash over all shingles (min
    ignores duplicates), so the explode dedups first and ``collect_set``
    doubles as the verification shingle set.

    NULL contract: documents whose text is NULL have no MinHash — they
    produce NO output row (filtered explicitly here, not dropped as an
    explode side-effect) and can never appear as near-dup candidates.
    Empty and short texts DO sign: the tokenizer keeps empty strings and
    sub-k-token docs yield one whole-doc shingle (portable.shingles), so
    e.g. all empty documents are mutual near-duplicates — the curation-
    friendly reading.
    """
    # Repartition BEFORE shingle construction: the input is a handful of
    # scan splits locally, and the shingle HOF (interpreted lambdas) is
    # the most expensive per-row step — it must run on all cores.
    # ``shingle_rows`` (columns: doc, s — one row per distinct per-doc
    # shingle, built with the same tokenizer/k) lets a caller that also
    # feeds another shingle consumer (e.g. the exact ssjoin in
    # dedup_lsh_recall_eval) pay the corpus shingle pass ONCE; persist
    # responsibility stays with that caller.
    if shingle_rows is not None:
        ex = shingle_rows.select("doc", "s")
    elif USE_ARROW_TEXT_KERNELS and _arrow_text_kernel_ok(df, text_col, id_col):
        # Map-only Arrow kernel (guide §4.2): per-doc shingle set, salted
        # md5 family and 4·n_salts chunk-MINs all inside one mapInArrow
        # pass — the shingle HOF, the explode, the md5 projection AND the
        # hash-aggregate exchange disappear.  Value-identical (see
        # _minhash_grouped_arrow docstring + parity tests).
        return _minhash_grouped_arrow(
            PART.ensure_min_partitions(df.where(F.col(text_col).isNotNull())),
            text_col,
            id_col,
            n_hashes,
            k,
        )
    else:
        sh = with_shingles(
            PART.ensure_min_partitions(df.where(F.col(text_col).isNotNull())),
            text_col,
            k,
        )
        ex = sh.select(
            F.col(id_col).alias("doc"),
            F.explode(F.array_distinct("shingles")).alias("s"),
        )
    with_md5 = ex.select(
        "doc",
        "s",
        *[
            F.expr(f"md5(concat('{salt}', '|', s))").alias(f"m{salt}")
            for salt in range(n_hashes // 4)
        ],
    )
    mins = [
        F.min(F.expr(f"substring(m{h // 4}, {(h % 4) * 8 + 1}, 8)")).alias(f"h{h}")
        for h in range(n_hashes)
    ]
    return with_md5.groupBy("doc").agg(*mins, F.collect_set("s").alias("sset"))


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n_hashes: int = 16, k: int = 3
) -> DataFrame:
    """(id, h, sig) MinHash rows (posexploded signature array)."""
    grouped = _minhash_grouped(df, text_col, id_col, n_hashes, k)
    sig = F.array(*[F.col(f"h{h}") for h in range(n_hashes)])
    return grouped.select(
        F.col("doc").alias(id_col), F.posexplode(sig).alias("h", "sig")
    )


def _banded(grouped: DataFrame, n_hashes: int, bands: int) -> DataFrame:
    """(doc, band, bh) LSH band rows from a ``_minhash_grouped`` relation:
    band hash = md5 over that band's signature slice.  Only these triples
    ever shuffle — never shingle sets or document bodies."""
    rows_per_band = n_hashes // bands
    band_structs = [
        "named_struct('band', {b}, 'bh', md5(concat_ws('|', {cols})))".format(
            b=b,
            cols=", ".join(
                f"h{h}" for h in range(b * rows_per_band, (b + 1) * rows_per_band)
            ),
        )
        for b in range(bands)
    ]
    return grouped.select(
        "doc",
        F.explode(F.expr(f"array({', '.join(band_structs)})")).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def cap_buckets(
    banded: DataFrame, max_bucket_size: int, keys: tuple[str, ...] = ("band", "bh")
) -> DataFrame:
    """Drop LSH buckets holding more than ``max_bucket_size`` members —
    the standard skew guard for banded joins.

    A degenerate bucket (thousands of boilerplate-identical docs sharing
    a band hash) makes the band self-join quadratic IN ONE KEY; AQE can
    split the shuffle partition but not the semantic blowup.  Over-full
    buckets carry no discriminative signal (everything matches
    everything), so production LSH systems drop them and let the exact
    tier (or another band) catch true duplicates.  Cost: one
    bucket-count aggregation + a semi join on the same keys — the same
    partitioning, so AQE reuses the exchange.
    """
    small = (
        banded.groupBy(*keys)
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") <= max_bucket_size)
        .select(*keys)
    )
    return banded.join(small, on=list(keys), how="left_semi")


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = None,
    shingle_rows: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band of their MinHash signature become
    candidate pairs; candidates are verified with exact shingle-set Jaccard.

    Shuffle profile: one exchange of (band, band_hash, id) triples, a
    self-join on the (tiny) matching buckets, then a re-join to fetch the
    two shingle arrays for verification.  Document bodies never shuffle.
    ``max_bucket_size`` (None = unlimited, the oracle-matched default)
    enables the :func:`cap_buckets` skew guard for corpora with massive
    boilerplate-duplicate groups.  ``shingle_rows`` (doc, s) substitutes
    a caller-computed distinct shingle relation for the internal corpus
    shingle pass (see :func:`_minhash_grouped`).
    """
    # Tracked persist: the signature relation feeds the band explode AND
    # both sides of the candidate-verification join — without it the
    # (md5-heavy) shingle/signature subtree is recomputed three times.
    # Long-lived callers release via uda_spark.cache.release_persisted().
    g = _minhash_grouped(df, text_col, id_col, n_hashes, k, shingle_rows)
    if (
        shingle_rows is None
        and REPARTITION_KERNEL_SIGNATURES
        and USE_ARROW_TEXT_KERNELS
        and _arrow_text_kernel_ok(df, text_col, id_col)
    ):
        # The Arrow kernel path is map-only, so the persisted relation
        # carries the scan partitioning; both verify joins below would
        # then each exchange the sset projection (the heavy shingle
        # arrays) by doc.  One explicit doc repartition BEFORE the
        # persist moves the arrays once and is reused by both joins
        # (the relational path gets this layout for free from its final
        # hash aggregate).  Interleaved 3-way A/B at sf0.1/32c, med of
        # 6: kernel 1.46 / kernel+repart 1.31 / relational 1.33.
        g = g.repartition(F.col("doc"))
    sh = cache.tracked_persist(g)
    banded = _banded(sh, n_hashes, bands)
    if max_bucket_size is not None:
        banded = cap_buckets(banded, max_bucket_size)

    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "bh"])
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )

    sets = sh.select("doc", "sset")
    pairs = (
        cand.join(sets.withColumnsRenamed({"doc": "doc_a", "sset": "set_a"}), on="doc_a")
        .join(sets.withColumnsRenamed({"doc": "doc_b", "sset": "set_b"}), on="doc_b")
        .withColumn("n_inter", F.expr("size(array_intersect(set_a, set_b))"))
        .withColumn(
            "jaccard",
            F.expr("CAST(n_inter AS DOUBLE) / (size(set_a) + size(set_b) - n_inter)"),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return pairs


def incremental_dedup(
    new_df: DataFrame,
    base_df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Dedup a NEW batch of documents against an EXISTING base corpus —
    the training-data refresh operation ("drop what the last crawl
    already has").  Output: one row per new document, (id, verdict) with
    verdict in ('exact_dup', 'near_dup', 'keep'); exact wins over near.

    Cross-side only by contract: duplicates WITHIN the new batch are not
    flagged here (compose with exact_dedup / minhash_near_dup_pairs for
    self-dedup).

    Scale shape (100 TB base, daily-crawl new batch): the exact tier
    joins 32-byte digests keyed by digest — bodies never move.  The near
    tier is the banded-LSH join across sides: (band, bh, id) triples
    shuffle, candidates verify by exact shingle-set Jaccard, and the
    base side's signature relation is exactly what a production deploy
    would precompute once and persist as a signature store — recomputing
    it here keeps the operator self-contained, swapping in a stored
    relation is a one-line change.
    """
    new_hash = new_df.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("content_hash")
    )
    base_hash = base_df.select(F.md5(F.col(text_col)).alias("content_hash")).distinct()
    exact_ids = (
        new_hash.join(base_hash, on="content_hash", how="left_semi")
        .select(F.col(id_col).alias("_exact_id"))
        .distinct()
    )

    def _grouped_for_join(side: DataFrame) -> DataFrame:
        g = _minhash_grouped(side, text_col, id_col, n_hashes, k)
        if (
            REPARTITION_KERNEL_SIGNATURES
            and USE_ARROW_TEXT_KERNELS
            and _arrow_text_kernel_ok(side, text_col, id_col)
        ):
            # same layout reasoning as minhash_near_dup_pairs: the
            # map-only kernel output repartitions by doc once so the
            # verify joins (on the renamed doc) reuse the persisted
            # partitioning instead of exchanging the sset arrays.
            g = g.repartition(F.col("doc"))
        return g

    ng = cache.tracked_persist(_grouped_for_join(new_df))
    bg = cache.tracked_persist(_grouped_for_join(base_df))
    nb = _banded(ng, n_hashes, bands)
    bb = _banded(bg, n_hashes, bands)
    if max_bucket_size is not None:
        # cap each side: a bucket's join width is |new-side| × |base-side|
        nb = cap_buckets(nb, max_bucket_size)
        bb = cap_buckets(bb, max_bucket_size)
    cand = (
        nb.withColumnRenamed("doc", "new_id")
        .join(bb.withColumnRenamed("doc", "base_id"), on=["band", "bh"])
        .select("new_id", "base_id")
        .distinct()
    )
    near_ids = (
        cand.join(
            ng.select(F.col("doc").alias("new_id"), F.col("sset").alias("set_n")),
            on="new_id",
        )
        .join(
            bg.select(F.col("doc").alias("base_id"), F.col("sset").alias("set_b")),
            on="base_id",
        )
        .withColumn("n_inter", F.expr("size(array_intersect(set_n, set_b))"))
        .where(
            F.expr("CAST(n_inter AS DOUBLE) / (size(set_n) + size(set_b) - n_inter)")
            >= jaccard_threshold
        )
        .select(F.col("new_id").alias("_near_id"))
        .distinct()
    )
    return (
        new_df.select(id_col)
        .join(exact_ids, new_df[id_col] == exact_ids["_exact_id"], "left")
        .join(near_ids, new_df[id_col] == near_ids["_near_id"], "left")
        .select(
            F.col(id_col),
            F.when(F.col("_exact_id").isNotNull(), F.lit("exact_dup"))
            .when(F.col("_near_id").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("keep"))
            .alias("verdict"),
        )
    )


def simhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, sig) 60-bit SimHash per document.

    Relational formulation for whole-stage codegen: tokens explode to
    rows; each row packs its 60 vote bits into four 15-nibble integers
    (conv of md5 hex — all codegen'd); one hash aggregate takes 60 bit
    SUMs plus the token count; the final projection packs the majority
    votes back into the signature.  Bit-identical to the higher-order
    ``portable.simhash60`` expression (vote i = high bit of hex char i of
    md5(t) || md5('x' || t)) but 2.7x faster at sf0.1 — HOF lambdas run
    interpreted (CodegenFallback), 120 per token, vs zero here.

    NULL contract: documents whose text is NULL have no SimHash — they
    produce NO output row (filtered explicitly here, not dropped as an
    explode side-effect) and can never appear as near-dup candidates.
    Empty text DOES sign (it tokenizes to one empty token — the
    tokenizer keeps empty strings), matching the MinHash contract.
    """
    if USE_ARROW_TEXT_KERNELS and _arrow_text_kernel_ok(df, text_col, id_col):
        return _simhash_signatures_arrow(
            PART.ensure_min_partitions(df.where(F.col(text_col).isNotNull())),
            text_col,
            id_col,
        )
    toks = portable.tokens(text_col, "spark")
    tok = PART.ensure_min_partitions(df.where(F.col(text_col).isNotNull())).select(
        F.col(id_col), F.explode(F.expr(toks)).alias("t")
    )
    m = "concat(md5(t), md5(concat('x', t)))"
    bits = tok.select(
        F.col(id_col),
        *[
            F.expr(
                f"CAST(conv(substring({m}, {15 * g + 1}, 15), 16, 10) AS BIGINT)"
            ).alias(f"b{g}")
            for g in range(4)
        ],
    )
    ones = []
    for i in range(1, portable.SIMHASH_BITS + 1):
        g, o = (i - 1) // 15, (i - 1) % 15
        ones.append(
            F.sum(F.expr(f"shiftright(b{g}, {4 * (14 - o) + 3}) & 1")).alias(f"o{i}")
        )
    grouped = bits.groupBy(id_col).agg(F.count("*").alias("n"), *ones)
    sig = " + ".join(
        f"IF(2 * o{i} - n >= 0, {1 << (portable.SIMHASH_BITS - i)}L, 0L)"
        for i in range(1, portable.SIMHASH_BITS + 1)
    )
    return grouped.select(F.col(id_col), F.expr(sig).alias("sig"))


def _simhash_signatures_arrow(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Map-only SimHash: (id, sig) computed per document inside one
    ``mapInArrow`` pass — the token explode, the two md5 projections and
    the 60-bit-SUM hash aggregate all collapse into the kernel (a doc's
    tokens live in its own row, so the vote sums need no shuffle).

    Value-identical to the relational formulation: vote i of token t is
    the high bit of hex char i of md5(t) || md5('x' || t) (here
    ``c >= '8'`` over the hexdigest — same definition), signature bit i
    is set iff 2·ones_i − n_tokens >= 0, packed at 2^(60−i).  Exact
    integer arithmetic throughout; duplicate tokens vote once per
    OCCURRENCE (Counter-weighted), matching the explode semantics.
    Per-batch digest memoization is a pure cache — votes depend only on
    the token bytes.
    """

    def gen(batches):
        from collections import Counter
        from hashlib import md5

        import numpy as np
        import pyarrow as pa

        bits = portable_bits = 60
        cache: dict[str, "np.ndarray"] = {}

        def votes(tok: str):
            v = cache.get(tok)
            if v is None:
                hx = md5(tok.encode("utf-8")).hexdigest() + md5(
                    ("x" + tok).encode("utf-8")
                ).hexdigest()
                v = np.array(
                    [1 if c >= "8" else 0 for c in hx[:portable_bits]],
                    dtype=np.int64,
                )
                cache[tok] = v
            return v

        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            sigs: list[int] = []
            for txt in texts:
                if txt is None:
                    raise ValueError(
                        "simhash kernel received NULL text — filter upstream"
                    )
                toks = txt.lower().split(" ")
                n = len(toks)
                ones = np.zeros(bits, dtype=np.int64)
                for tok, cnt in Counter(toks).items():
                    ones += cnt * votes(tok)
                sig = 0
                for i in range(bits):
                    if 2 * int(ones[i]) - n >= 0:
                        sig += 1 << (bits - 1 - i)
                sigs.append(sig)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(sigs, pa.int64())],
                names=["doc", "sig"],
            )

    return (
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_text"))
        .mapInArrow(gen, "doc long, sig long")
        .withColumnRenamed("doc", id_col)
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Label every node in the near-dup pair graph with its component's
    minimum id — the clustering step that turns pairwise matches into
    dedup groups (keep min id, drop the rest).

    Algorithm: large-star/small-star-style min-label propagation.  Each
    iteration joins the current (node, label) assignment to the edge
    list and lowers each node's label to the min over its neighborhood;
    terminates when no label changes and RAISES if max_iterations rounds
    were insufficient (silent non-convergence would emit split clusters).
    Propagation is one hop per round, so rounds ~ component diameter —
    near-dup clusters are tiny and dense in practice (2-3 rounds); the
    O(log n) large-star/small-star variant is the upgrade path if LSH
    ever emits long chains.

    Scale shape per iteration: one shuffle of (node, label) keyed by
    node for the edge join, one groupBy(node) min — both on the same
    key, so AQE reuses the partitioning.  The edge list never grows;
    checkpointing via localCheckpoint() every iteration truncates the
    lineage so plan size stays constant.

    Output: (node, component) — component = min node id in the cluster.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        # materialize once: every iteration joins the edge list, and the
        # upstream pair pipeline (LSH band join + verification) must not
        # re-execute per round
        .transform(_snapshot)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    # Convergence check: per-node labels are monotonically NON-INCREASING
    # (each round takes a min with the old label), so the label SUM
    # strictly decreases until the fixpoint — sum unchanged ⟺ no node
    # changed, exactly.  One scalar aggregate on the just-checkpointed
    # relation replaces the old updated⋈labels inequality join + count
    # per round (r13; one fewer join/exchange per round, same labels).
    prev_sum = None
    for _ in range(max_iterations):
        # neighbor labels: for each edge (src,dst), dst's current label
        nbr = (
            edges.join(
                labels.withColumnsRenamed({"node": "dst", "component": "nbr_label"}),
                on="dst",
            )
            .groupBy("src")
            .agg(F.min("nbr_label").alias("nbr_min"))
        )
        updated = (
            labels.join(nbr, labels["node"] == nbr["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        # LAZY checkpoint: the convergence probe right below is the
        # single full-pass consumer, so it materializes the round's
        # labels and computes the sum in ONE job (the eager variant
        # paid a dedicated count job per round).  The initial `edges`
        # snapshot above stays EAGER: it fans out into two union
        # branches of the same stage, where unpersisted blocks race.
        updated = updated.transform(_snapshot_lazy)
        # Cast INSIDE the aggregate so accumulation is exact decimal:
        # summing long first would overflow at corpus-scale id ranges
        # (~1e12 nodes × 64-bit ids) — ANSI throws, non-ANSI wraps and
        # could falsely report convergence (r14 fix).
        cur_sum = updated.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).first()[0]
        labels = updated
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (component diameter exceeds the bound) — raise "
            "max_iterations; propagation is one hop per round"
        )
    return labels.select("node", "component")


# Hot nodes broadcast per star round are bounded: beyond this many, the
# rest stay on the shuffled path (where AQE skew-join is the backstop), so
# the broadcast can never itself become the memory problem.
_STAR_MAX_HOT = 4096


def _min_join(
    rows: DataFrame,
    key: str,
    val: str,
    include_self: bool,
    hot_degree_threshold: int | None,
) -> DataFrame:
    """Join every ``(key, val)`` row with ``m`` = min(val) per key
    (optionally also min'd with the key itself) — the per-round kernel of
    star CC, degree-skew-guarded.

    Both star steps are "edge list ⋈ per-key aggregate of itself", and a
    hub node (one giant near-dup family) puts ALL its rows on one join
    key.  With ``hot_degree_threshold`` set, keys whose degree exceeds it
    resolve through a BROADCAST of their (single-row) aggregates instead
    of the shuffled join — the hub's rows never shuffle on the hub key at
    all (the preceding groupBy is safe either way: partial aggregation
    bounds per-task input).  The degree comes free as a COUNT alongside
    the MIN, i.e. the same readout `graph_degree_histogram` profiles —
    this is that histogram's heavy tail wired in as an execution guard,
    the join-side analog of :func:`cap_buckets`.  Hot keys beyond
    ``_STAR_MAX_HOT`` stay on the shuffled path, so the broadcast stays
    bounded no matter how degenerate the graph.
    """
    m_col = F.least(F.col("mn"), F.col(key)) if include_self else F.col("mn")
    mins = (
        rows.groupBy(key)
        .agg(F.min(val).alias("mn"), F.count("*").alias("deg"))
        .select(key, m_col.alias("m"), "deg")
    )
    if hot_degree_threshold is None:
        return rows.join(mins.select(key, "m"), on=key)
    hot = (
        mins.where(F.col("deg") > hot_degree_threshold)
        .orderBy(F.col("deg").desc(), key)
        .limit(_STAR_MAX_HOT)
        .select(key, "m")
    )
    cold_rows = rows.join(F.broadcast(hot.select(key)), on=key, how="left_anti")
    hot_joined = rows.join(F.broadcast(hot), on=key)
    cold_joined = cold_rows.join(mins.select(key, "m"), on=key)
    return hot_joined.union(cold_joined)


def _star_round(
    edges: DataFrame, hot_degree_threshold: int | None = None
) -> DataFrame:
    """One large-star + small-star alternation over a directed edge list
    (hi, lo) with hi > lo; returns a new (hi, lo) edge list with the same
    connected components."""
    # large-star: each node u connects its strictly-larger neighbors to
    # min(neighborhood ∪ {u}) — long chains halve toward the minimum
    sym = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
        edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    # NO distinct here (r13, guide §2.4): min is duplicate-insensitive,
    # so duplicate (hi, lo) rows cannot change the small-star groupBy-min
    # below, and every downstream consumer dedups at the round's final
    # distinct — the intermediate distinct was a full exchange of the
    # rewritten edge list per round for nothing (measured at sf0.1:
    # CC tail 1.36s → 1.06s, labels identical).  The hot-degree counts
    # may inflate with duplicates, which only shifts keys between the
    # broadcast and shuffled paths of _min_join — both compute the same
    # relation.
    large = (
        _min_join(sym, "u", "v", True, hot_degree_threshold)
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        .where(F.col("hi") != F.col("lo"))
    )
    # small-star: each node connects its smaller neighbors (and itself)
    # to the minimum of that set — flattens local trees into stars
    with_min = _min_join(large, "hi", "lo", False, hot_degree_threshold)
    leaves = with_min.select(F.col("lo").alias("node"), "m").where(
        F.col("node") != F.col("m")
    )
    # one row per hi suffices for centers; duplicates fold in the final
    # distinct, so no extra exchange here
    centers = with_min.select(F.col("hi").alias("node"), "m")
    return (
        leaves.union(centers)
        .select(F.col("node").alias("hi"), F.col("m").alias("lo"))
        .where(F.col("hi") != F.col("lo"))
        .distinct()
    )


# Observability: rounds used by the most recent connected_components_star
# call on this driver (the algorithm is deterministic per input, so a
# run-to-run wall-time swing with a CONSTANT round count is environmental,
# not algorithmic — recorded per VERDICT r06 #6).
LAST_STAR_ROUNDS: int | None = None


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    # a 4096-node path (diameter 4095) converges in 14 rounds (measured,
    # tests/test_operators.py::test_star_cc_chain_beats_diameter); 16
    # covers ~2^14-diameter chains and costs nothing when convergence is
    # earlier (the loop breaks on the edge-set signature)
    max_iterations: int = 16,
    # degree above which a node's per-round min-join resolves via
    # broadcast instead of a shuffled join (see _min_join).  ADAPTIVE:
    # one aggregation over the checkpointed input edges (the
    # `graph_degree_histogram` readout reduced to its max) decides
    # whether any node actually crosses the threshold — the guard pays
    # a constant 2-3x per round (the min relation feeds the hot filter,
    # the anti-join, AND the cold join; measured at sf0.1: cluster
    # histogram 2.2s plain vs 6.1s always-guarded), so it only runs
    # when a hot family exists.  Caveat (deliberate): star rounds
    # concentrate degree on component minima, so a cold input with one
    # huge-diameter component can grow a hot min mid-run — that
    # residual case rides on AQE's skew-join split (proven firing in
    # plans/partitioning.py); the realistic degenerate shape (a
    # template-spam near-dup family, hot from round 0) takes the
    # guarded path from the start.  None skips the profiling entirely.
    hot_degree_threshold: int | None = None,
) -> DataFrame:
    """Connected components via alternating large-star/small-star edge
    rewriting — the O(log n)-round formulation (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) that
    :func:`connected_components` names as its upgrade path for graphs
    with long chains, where one-hop min-label propagation needs
    O(diameter) rounds.

    Each round rewires edges toward component minima: large-star points
    every larger neighbor at the neighborhood minimum (halving chain
    distances), small-star flattens the resulting trees into stars.  The
    fixed point is a star forest — every node points directly at its
    component's minimum id — so the label relation falls straight out of
    the edge list with no separate propagation phase.

    Scale shape per round: two groupBy-min aggregations and two joins,
    all keyed on node ids (never content); the edge list SHRINKS
    monotonically toward one edge per non-root node, so later rounds are
    cheaper than earlier ones.  localCheckpoint per round truncates
    lineage (constant plan size).  Convergence is detected by an edge-set
    signature (count + bit_xor of xxhash64(hi, lo), overflow-free under
    ANSI mode) — one aggregation action, no extra join; a colliding
    signature for *different* consecutive edge sets (probability ~2^-64
    per round on deterministic data) is the only failure mode, and
    RAISES on round exhaustion rather than returning split clusters.

    Output: (node, component) — component = min node id in the cluster,
    identical to :func:`connected_components`.
    """
    edges = (
        pairs.select(
            F.greatest(F.col(a_col), F.col(b_col)).alias("hi"),
            F.least(F.col(a_col), F.col(b_col)).alias("lo"),
        )
        .where(F.col("hi") != F.col("lo"))
        .distinct()
        .transform(_snapshot)
    )
    if hot_degree_threshold is not None:
        # degree readout on the CHECKPOINTED edges (the upstream pair
        # pipeline never re-executes) — one cheap aggregation deciding
        # whether the guarded rounds are worth their constant
        max_deg = (
            edges.select(F.col("hi").alias("n"))
            .union(edges.select(F.col("lo").alias("n")))
            .groupBy("n")
            .agg(F.count("*").alias("d"))
            .agg(F.max("d"))
            .first()[0]
            or 0
        )
        if max_deg <= hot_degree_threshold:
            hot_degree_threshold = None
    global LAST_STAR_ROUNDS
    prev_sig = None
    for rounds_used in range(1, max_iterations + 1):
        # LAZY checkpoint: the signature probe below is the single
        # full-pass consumer — materialization and convergence check
        # share one job per round (initial snapshot stays eager: it
        # fans out into the round's two union branches).
        edges = _star_round(edges, hot_degree_threshold).transform(_snapshot_lazy)
        row = edges.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(hi, lo))").alias("h"),
        ).first()
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            LAST_STAR_ROUNDS = rounds_used
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iterations} "
            "rounds — pathological for O(log n) convergence; raise "
            "max_iterations"
        )
    return (
        edges.select(F.col("hi").alias("node"), F.col("lo").alias("component"))
        .union(edges.select(F.col("lo").alias("node"), F.col("lo").alias("component")))
        .distinct()
    )


def minhash_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    containment_threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Asymmetric near-duplicate detection: pairs where the SMALLER
    shingle set is mostly contained in the larger (containment =
    |A∩B| / min(|A|, |B|)) — catches quotes, excerpts, and
    superset/subset documents that symmetric Jaccard misses (a short
    doc fully quoted inside a long one has low Jaccard but containment
    1.0).  Same banded-LSH candidate generation and shuffle profile as
    :func:`minhash_near_dup_pairs`; only the verification metric
    differs.
    """
    sh = cache.tracked_persist(_minhash_grouped(df, text_col, id_col, n_hashes, k))
    banded = _banded(sh, n_hashes, bands)
    if max_bucket_size is not None:
        banded = cap_buckets(banded, max_bucket_size)
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "bh"])
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    sets = sh.select("doc", "sset")
    return (
        cand.join(sets.withColumnsRenamed({"doc": "doc_a", "sset": "set_a"}), on="doc_a")
        .join(sets.withColumnsRenamed({"doc": "doc_b", "sset": "set_b"}), on="doc_b")
        .withColumn("n_inter", F.expr("size(array_intersect(set_a, set_b))"))
        .withColumn(
            "containment",
            F.expr("CAST(n_inter AS DOUBLE) / least(size(set_a), size(set_b))"),
        )
        .where(F.col("containment") >= containment_threshold)
        .select("doc_a", "doc_b", F.round("containment", 6).alias("containment"))
    )


def minhash_calibration_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Per-candidate MinHash calibration: signature-estimated Jaccard
    next to the exact shingle-set Jaccard for every LSH candidate pair
    (NO threshold filter — sub-threshold candidates are the interesting
    ones when tuning bands/rows against a corpus).

    The estimate is the classic matching-components fraction
    ``n_match / n_hashes``; comparing it against the exact value over
    the live candidate set is how a deployment picks N_HASHES/BANDS
    before committing a 100 TB dedup run to them.

    Same shuffle profile as :func:`minhash_near_dup_pairs` (band
    triples; signature relation persisted once, reused by the explode
    and both verification sides); the signature arrays that ride along
    the verification join are n_hashes × 8-char strings per doc —
    constant width, never document bodies.
    """
    sh = cache.tracked_persist(_minhash_grouped(df, text_col, id_col, n_hashes, k))
    banded = _banded(sh, n_hashes, bands)
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "bh"])
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    sig = F.array(*[F.col(f"h{h}") for h in range(n_hashes)])
    sides = sh.select("doc", sig.alias("sig"), "sset")
    n_match = (
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), "
        "0, (acc, e) -> acc + e)"
    )
    return (
        cand.join(
            sides.withColumnsRenamed({"doc": "doc_a", "sig": "sig_a", "sset": "set_a"}),
            on="doc_a",
        )
        .join(
            sides.withColumnsRenamed({"doc": "doc_b", "sig": "sig_b", "sset": "set_b"}),
            on="doc_b",
        )
        .withColumn("n_match", F.expr(n_match))
        .withColumn("n_inter", F.expr("size(array_intersect(set_a, set_b))"))
        .select(
            "doc_a",
            "doc_b",
            F.col("n_match").cast("int").alias("n_match"),
            F.col("n_inter").cast("long").alias("n_inter"),
            F.size("set_a").cast("long").alias("na"),
            F.size("set_b").cast("long").alias("nb"),
            F.round(F.col("n_match").cast("double") / n_hashes, 6).alias("jaccard_est"),
            F.round(
                F.expr("CAST(n_inter AS DOUBLE) / (size(set_a) + size(set_b) - n_inter)"),
                6,
            ).alias("jaccard_exact"),
        )
    )


def prefix_filter_similarity_pairs(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_num: int = 3,
    threshold_den: int = 5,
    prefix_cap: int = 1000,
    shingle_k: int = 3,
    shingle_rows: DataFrame | None = None,
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (PPJoin-style
    candidate generation; see queries/dedup.py::dedup_prefix_filter_pairs
    for the theory and the oracle).  Returns (doc_a, doc_b, n_inter,
    jaccard_ppm) for every pair with shingle-set Jaccard >=
    threshold_num/threshold_den.

    Scale guards (both mirrored in the registered oracle):

    * length filter INSIDE the candidate equi-join — a pair with
      ``den*least(na,nb) < num*greatest(na,nb)`` can never reach the
      threshold (J <= min/max), so it never reaches the distinct or the
      verify join.  Sound: zero false negatives.
    * ``prefix_cap`` — prefix tokens shared by more than this many docs
      (only possible inside a >cap boilerplate family) are excluded from
      candidate generation; the one documented approximation, and the
      ssjoin analog of the LSH ``max_bucket_size`` guard.  Set
      ``prefix_cap=None`` for the fully-exact join.

    Reference parity: candidate pruning plays the role of the
    reference's anti-hotspot guards (src/MOFServer hot-partition logic);
    the verify join is the exact-intersection counterpart of its digest
    verification pass.
    """
    from pyspark.sql import Window

    num, den = threshold_num, threshold_den
    if shingle_rows is not None:
        # caller-shared distinct (doc, s) relation — same tokenizer/k
        # contract as _minhash_grouped's shingle_rows; persist stays the
        # caller's responsibility
        tk = shingle_rows.select(
            F.col("doc").alias("doc_id"), F.col("s").alias("tok")
        )
    else:
        # Measured r14: swapping this build for shingle_rows_arrow was a
        # WASH-to-slight-loss (interleaved min-of-5 at sf0.1: relational
        # 4.32s vs kernel 4.59s full-query; bare tk 0.50 vs 0.71) — at
        # k=3 the explode+HOF is one cheap pass here and the kernel pays
        # the JVM→Python→JVM row transfer without removing any exchange
        # (unlike _minhash_grouped, where the kernel also absorbs the md5
        # projection and the signature aggregate).  Kept relational.
        sh = portable.shingles(portable.tokens(text_col, "spark"), shingle_k, "spark")
        # spread the interpreted shingle HOF over all cores — the local
        # corpus scan is 1-3 splits (same discipline as _minhash_grouped).
        # (explode(array_distinct(...)) already emits unique (doc, tok)
        # rows; the historical .distinct() here was a redundant exchange,
        # kept out of both paths.)
        tk = cache.tracked_persist(
            PART.ensure_min_partitions(corpus).select(
                F.col(id_col).alias("doc_id"),
                F.explode(F.array_distinct(F.expr(sh))).alias("tok"),
            )
        )
    dfreq = tk.groupBy("tok").agg(F.count("*").alias("df"))
    wdoc = Window.partitionBy("doc_id").orderBy("df", "tok")
    ranked = (
        tk.join(dfreq, on="tok")
        .withColumn("rn", F.row_number().over(wdoc))
        .withColumn("n", F.count("*").over(Window.partitionBy("doc_id")))
    )
    keep = F.col("rn") <= F.col("n") - F.expr(
        f"({num} * n + {den} - 1) div {den}"
    ) + 1
    if prefix_cap is not None:
        keep = keep & (F.col("df") <= prefix_cap)
    pfx = ranked.where(keep).select("doc_id", "tok", "n", "rn")
    # Candidate join with three sound prunes (zero false negatives each):
    #  * length filter — J <= min/max, so den*least < num*greatest pairs
    #    can never qualify;
    #  * positional filter (PPJoin) — a qualifying pair needs overlap
    #    I with I*(num+den) >= num*(na+nb); the globally-smallest shared
    #    token w* lies in BOTH prefixes (fewer than the required overlap
    #    would remain after a deeper position), every shared token sits
    #    at rank >= rn(w*) on both sides, so I <= 1 + min(na-rn_a,
    #    nb-rn_b) at w*'s row — any pair whose every shared-prefix row
    #    fails that bound is impossible.  Measured at sf0.1: 266k -> 93k
    #    candidates before verification.
    cand = (
        pfx.alias("a")
        .join(
            pfx.alias("b"),
            F.expr(
                "a.tok = b.tok AND a.doc_id < b.doc_id"
                f" AND {den} * least(a.n, b.n) >= {num} * greatest(a.n, b.n)"
                f" AND ({num} + {den}) * (1 + least(a.n - a.rn, b.n - b.rn))"
                f" >= {num} * (a.n + b.n)"
            ),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # Verify by array intersection against the per-doc shingle SETS: the
    # candidate relation is tiny after pruning (length filter + posting
    # cap), so joining it against the set relation lets AQE broadcast the
    # candidates and the full shingle relation never re-shuffles — ~25%
    # faster than re-joining the exploded tk relation twice and grouping
    # (measured at sf0.1), with the identical exact intersection count.
    sets = tk.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("tok")).alias("sset"),
        F.count("*").cast("long").alias("n"),
    )
    return (
        cand.join(
            sets.select(
                F.col("doc_id").alias("doc_a"),
                F.col("sset").alias("set_a"),
                F.col("n").alias("na"),
            ),
            on="doc_a",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("doc_b"),
                F.col("sset").alias("set_b"),
                F.col("n").alias("nb"),
            ),
            on="doc_b",
        )
        .withColumn(
            "n_inter",
            F.expr("CAST(size(array_intersect(set_a, set_b)) AS BIGINT)"),
        )
        .where(
            F.col("n_inter") * den >= num * (F.col("na") + F.col("nb") - F.col("n_inter"))
        )
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            F.expr("CAST(n_inter * 1000000 div (na + nb - n_inter) AS BIGINT)").alias(
                "jaccard_ppm"
            ),
        )
    )
