"""Exact substring dedup — the C4 path (suffix array + fingerprint join).

Capability replaced: the reference's substring-semantics duplicate deletion
(`str.contains(old_summary)`, api_server.py:800-813) and boilerplate
detection. Two cooperating mechanisms:

1. **Mod-sampled fingerprint join (the scale path).** Every L-char shingle
   hash with ``hash % sample == 0`` is a fingerprint (deterministic 1/sample
   sampling of the shingle stream — any shared substring of length
   ≥ L + sample·E[gap] shares a fingerprint w.h.p.; with sample=1 recall is
   exact for shared substrings ≥ L). Docs are joined on fingerprints —
   JVM-side end to end, same hot-bucket capping as LSH.

2. **Per-partition suffix array (the exact verifier).** Inside
   ``applyInPandas`` over fingerprint-bucketed groups, a numpy prefix-doubling
   suffix array + Kasai LCP over the concatenated member texts emits, for
   every adjacent cross-document suffix pair, the exact shared-substring
   length; pairs with LCP ≥ L become verified edges. Exactness is scoped to
   within a bucket-group — the fingerprint join is what brings substring-
   sharing docs into the same group across partitions (SURVEY.md §7.5
   boundary contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.shingle import char_shingles


def fingerprints(text, length: int = 32, sample: int = 1):
    """array<long> of mod-sampled L-char shingle hashes (JVM-side).

    Texts shorter than ``length`` yield an EMPTY array, not the
    ``char_shingles`` whole-text fallback: a fingerprint here certifies a
    shared run of ≥ ``length`` chars (the certificate branch of
    ``_grouped_verify`` stamps ``span_len = length`` on edges derived from
    it), and a doc shorter than ``length`` cannot contain one — the
    fallback hash would let two identical short docs assert an impossible
    span."""
    sh = F.when(
        F.length(text) >= length, char_shingles(text, length)
    ).otherwise(F.array().cast("array<long>"))
    if sample <= 1:
        return sh
    return F.filter(sh, lambda h: F.pmod(h, F.lit(sample)) == 0)


def substring_postings(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "url",
    min_len: int = 32,
    sample: int = 1,
) -> DataFrame:
    """(key, fp) distinct fingerprint postings — the substring path's
    nomination table and its ONLY incremental state (committed as the
    ``substr_postings`` stage by checkpointed runs; ``apply_append`` joins
    an appended batch's postings against it instead of re-winnowing the
    corpus).

    ``sample <= 1`` → winnowed rolling-hash fingerprints with the exact
    recall guarantee (k = min_len − w + 1, window w: any shared run of
    ≥ min_len chars shares a posting VALUE — see the winnowing note in
    ``substring_edges``). ``sample > 1`` → mod-sampled min_len-gram hashes
    (the documented sampled-recall contract in the module docstring).
    Postings are a pure per-doc function, so an append never changes the
    existing rows — state maintenance is a blind union.
    """
    # docs shorter than min_len chars cannot contain a ≥ min_len-char run,
    # so they emit NO postings: nothing true is lost (one-sided recall
    # contract), nomination never groups them, and the state table stays
    # free of whole-text fallback hashes that would otherwise pair
    # identical short docs (spam/boilerplate stubs) into useless groups
    slim = docs.select(F.col(key_col), F.col(text_col)).where(
        F.length(F.col(text_col)) >= min_len
    )
    # (key, fp) is globally unique by construction: each doc contributes ONE
    # array row, so duplicates can only come from repeats WITHIN a doc —
    # array_distinct removes them in-row, replacing what used to be a full
    # shuffle-distinct of the exploded postings with zero exchanges
    if sample <= 1:
        from .winnow import winnow_fingerprints

        w = max(2, min(16, min_len // 3))
        fpdf = winnow_fingerprints(
            slim, text_col, key_col, k=min_len - w + 1, window=w
        )
        return fpdf.select(
            F.col(key_col),
            F.explode(F.array_distinct("fingerprints")).alias("fp"),
        )
    return slim.select(
        F.col(key_col),
        F.explode(
            F.array_distinct(fingerprints(F.col(text_col), min_len, sample))
        ).alias("fp"),
    )


def fingerprint_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "url",
    length: int = 32,
    sample: int = 1,
    max_bucket_size: int = 200,
    fps: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Docs sharing ≥1 fingerprint → candidate pairs + salted-fp lineage.

    Hot fingerprints (boilerplate shared by >cap docs) are salted, not
    dropped (operators/buckets.py) — full recall, bounded per-task work.
    Pass ``fps`` (a ``substring_postings`` table) to reuse precomputed
    postings instead of re-fingerprinting ``docs``.
    """
    from .buckets import salted_bucket_pairs

    if fps is None:
        fps = docs.select(
            F.col(key_col),
            F.explode(fingerprints(F.col(text_col), length, sample)).alias("fp"),
        ).distinct()
    pairs, hot = salted_bucket_pairs(fps, ["fp"], key_col, max_bucket_size)
    return pairs.distinct(), hot


# --------------------------------------------------------------------------
# numpy suffix array (prefix doubling) + Kasai LCP
# --------------------------------------------------------------------------

def suffix_array(codes: np.ndarray) -> np.ndarray:
    """Suffix array of an int sequence via prefix doubling (O(n log² n))."""
    n = codes.size
    rank = np.unique(codes, return_inverse=True)[1].astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    k = 1
    while k < n:
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        pair = np.stack([rank[order], second[order]], axis=1)
        new_rank = np.empty(n, dtype=np.int64)
        changed = np.any(pair[1:] != pair[:-1], axis=1)
        new_rank[order] = np.concatenate(([0], np.cumsum(changed)))
        sa, rank = order, new_rank
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa


def lcp_array(codes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = LCP(suffix sa[i], suffix sa[i+1]).

    Kasai's h-decrement walk is inherently sequential, so the loop stays in
    Python — but over plain lists, not numpy arrays: scalar indexing on
    ndarrays boxes a numpy scalar per access (~10× a list index), and this
    loop is the per-group verification's hot spot on large boilerplate
    groups (total work is O(n) amortized; every h increment is matched by
    at most one decrement)."""
    n = codes.size
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = [0] * max(n - 1, 0)
    codes_l = codes.tolist()
    sa_l = sa.tolist()
    rank_l = rank.tolist()
    h = 0
    for i in range(n):
        r = rank_l[i]
        if r < n - 1:
            j = sa_l[r + 1]
            while i + h < n and j + h < n and codes_l[i + h] == codes_l[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return np.asarray(lcp, dtype=np.int64)


def _pair_lcs(
    owner: np.ndarray,
    sa: np.ndarray,
    lcp: np.ndarray,
    a: int,
    b: int,
) -> int:
    """Exact longest-common-substring length of docs a and b inside one
    group's generalized suffix array.

    Classic reduction: restrict the SA to suffixes owned by a or b; the
    pair's LCS is the max over consecutive restricted entries with
    DIFFERENT owners of the range-min LCP between their ranks. The range
    mins come from one ``np.minimum.reduceat`` over the lcp array (O(L)
    per pair, no sparse table).
    """
    own = owner[sa]
    ranks = np.flatnonzero((own == a) | (own == b))
    if ranks.size < 2:
        return 0
    cross = own[ranks[:-1]] != own[ranks[1:]]
    if not cross.any():
        return 0
    # min lcp[ranks[i] : ranks[i+1]] per consecutive restricted pair.
    # reduceat's LAST segment runs to the end of lcp, not to ranks[-1] —
    # recompute it over the intended window
    seg_min = np.minimum.reduceat(lcp, ranks[:-1])
    seg_min[-1] = lcp[ranks[-2] : ranks[-1]].min()
    return int(seg_min[cross].max())


def _group_spans(pdf: pd.DataFrame, min_len: int, exact_lcs: bool = False) -> pd.DataFrame:
    """Exact shared-substring pairs within one group of docs.

    Concatenate member texts with unique negative separators, build the
    suffix array + Kasai LCP, and scan the *maximal runs* of adjacent
    LCP ≥ min_len. All suffixes of one run share a prefix of length
    ≥ run-min LCP, so every pair of distinct docs appearing in the run
    shares a substring that long — and conversely, any two docs sharing an
    L-gram have their suffixes contiguous in SA order, i.e. land in one
    run. Emitting all distinct-owner pairs per run is therefore *exactly*
    the docs-sharing-an-L-gram relation, for any number of docs per group
    (pairwise adjacency alone would miss pairs separated by a third doc's
    suffixes inside the run). ``span_len`` is the max over runs of the
    run-min LCP — a guaranteed shared-substring length (≥ min_len; not
    necessarily the longest common substring of the pair).
    """
    # object dtype for the key columns: the group key type follows the
    # caller's key column (string urls, long doc_ids, …) — Arrow casts the
    # python values (or the empty column) to the declared schema either way
    empty = pd.DataFrame(
        {
            "key_l": pd.Series(dtype=object),
            "key_r": pd.Series(dtype=object),
            "span_len": pd.Series(dtype="int64"),
        }
    )
    keys = pdf["url"].tolist()
    texts = pdf["text"].tolist()
    parts, owners = [], []
    for idx, t in enumerate(texts):
        codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        parts.append(codes)
        parts.append(np.array([-(idx + 1)], dtype=np.int64))  # unique separator
        owners.append(np.full(codes.size + 1, idx, dtype=np.int64))
    if not parts:
        return empty
    codes = np.concatenate(parts)
    owner = np.concatenate(owners)
    sa = suffix_array(codes)
    lcp = lcp_array(codes, sa)
    if lcp.size == 0:
        return empty

    rows: dict[tuple[str, str], int] = {}
    mask = lcp >= min_len
    # maximal runs of consecutive True in mask: lcp[i..j] all ≥ min_len
    # covers suffix positions sa[i..j+1]
    edges_idx = np.flatnonzero(np.diff(np.concatenate(([0], mask.view(np.int8), [0]))))
    for s, e in edges_idx.reshape(-1, 2):  # run over lcp[s:e]
        os_ = owner[sa[s : e + 1]]
        uniq = np.unique(os_)
        if uniq.size < 2:
            continue
        span = int(lcp[s:e].min())
        for ai in range(uniq.size):
            for bi in range(ai + 1, uniq.size):
                a, b = uniq[ai], uniq[bi]
                if keys[a] == keys[b]:
                    # the same url appearing twice in one group (duplicate
                    # input rows) must not emit a self-edge — the engine-wide
                    # edge contract is distinct pairs with key_l < key_r
                    continue
                ka, kb = (
                    (keys[a], keys[b]) if keys[a] < keys[b] else (keys[b], keys[a])
                )
                if span > rows.get((ka, kb), 0):
                    rows[(ka, kb)] = span
    if not rows:
        return empty
    if exact_lcs:
        # upgrade each emitted pair's guaranteed span to its TRUE longest
        # common substring (pair set unchanged — membership was already
        # exact); opt-in because it costs O(L) per pair
        idx = {k: i for i, k in enumerate(keys)}
        for ka, kb in list(rows):
            rows[(ka, kb)] = _pair_lcs(owner, sa, lcp, idx[ka], idx[kb])
    ks = list(rows)
    return pd.DataFrame(
        {
            "key_l": [k[0] for k in ks],
            "key_r": [k[1] for k in ks],
            "span_len": [rows[k] for k in ks],
        }
    )


def _star_edges(fps: "DataFrame", key_col: str) -> "DataFrame":
    """(key, fp) postings → distinct per-fingerprint star edges (key_l,
    key_r) with key_l = the fingerprint group's min key (so key_l < key_r
    by construction). Connected components of the star graph equal those
    of the full share-a-fingerprint pair graph at O(postings) rows.

    One window over fp (min key per fingerprint partition, unbounded
    frame — spill-aware for boilerplate mega-postings) instead of the
    former groupBy-reps + re-join: the postings shuffle once and need no
    persist for double consumption. Singleton fingerprints emit nothing
    (their only member IS the min).
    """
    from pyspark.sql.window import Window

    rep = F.min(key_col).over(Window.partitionBy("fp"))
    return (
        fps.withColumn("_rep", rep)
        .where(F.col(key_col) != F.col("_rep"))
        .select(F.col("_rep").alias("key_l"), F.col(key_col).alias("key_r"))
        .distinct()
    )


def substring_edges(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "url",
    min_len: int = 32,
    sample: int = 1,
    max_bucket_size: int = 200,
    max_group_docs: int = 256,
    postings: DataFrame | None = None,
    exact_lcs: bool = False,
    temps: list[DataFrame] | None = None,
) -> DataFrame:
    """Verified exact-shared-substring edges (key_l, key_r, span_len).
    Pass ``postings`` (a committed ``substring_postings`` stage) to skip
    re-fingerprinting ``docs``. ``exact_lcs=True`` makes span_len the TRUE
    pairwise longest-common-substring length for SA-verified groups
    (opt-in — O(L) extra per pair; certificate edges keep the min_len
    lower bound). ``temps`` collects every DataFrame this call persists —
    callers that materialize the result (a stage commit, a bench count)
    should unpersist them afterwards or the pins outlive their use for the
    session's lifetime.

    Plan: the fingerprint table nominates candidate GROUPS (connected
    components of the share-a-fingerprint relation), each doc's text is
    shipped ONCE into its group, and one suffix array per group verifies
    every pair in it (`_group_spans` run-scan — exact for the whole group).
    Components larger than ``max_group_docs`` (boilerplate near-cliques,
    whose true pair set is Ω(n²) by construction) emit a spanning
    CERTIFICATE of true edges instead — per-fingerprint star edges, O(n)
    rows with identical connected components and ``span_len = min_len``
    lower bounds — see the inline comment at the oversized branch.

    Grouping is built from linear STAR EDGES, not pairwise co-occurrence:
    every fingerprint contributes (min member → member) edges, whose
    connected components are identical to the candidate pair graph's (two
    docs sharing a fingerprint are both adjacent to that fingerprint's
    representative) at O(Σ postings) rows instead of O(Σ postings²). With
    ``sample == 1`` (default) the group SA's output IS the exact
    docs-sharing-an-L-gram relation — any two docs sharing an L-char run
    share that L-gram's fingerprint and land in one group — so no
    candidate-pair restriction is needed. With ``sample > 1`` fingerprints
    under-nominate by design (recall contract in the module docstring) and
    the output is restricted to nominated pairs, preserving round-2
    semantics. ``span_len`` is a guaranteed shared-substring length — the
    max over SA runs of the run-min LCP, ≥ min_len but NOT necessarily the
    pair's longest common substring (changed from the round-1 per-pair
    adjacent-LCP max).

    Note the grouping component labels must NEVER seed a downstream
    clustering as pre-merged labels: with winnowed nomination (k =
    min_len − w + 1 < min_len) a group can contain docs sharing only a
    k-byte run — docs the SA then correctly REJECTS as pairs — so the
    grouping partition is strictly coarser than the verified-edge
    components. Only the returned verified edges carry clustering
    semantics. (The round-3 latency here was instead removed structurally:
    per-doc array_distinct postings — no global distinct shuffle — and
    window-min star edges — one shuffle, no reps join, no postings
    persist.)
    """
    slim = docs.select(F.col(key_col), F.col(text_col))

    if postings is None:
        # Exact-recall nomination (sample <= 1) via WINNOWED fingerprints,
        # not one fingerprint per character position. The classic winnowing
        # guarantee (operators/winnow.py module docstring): with k-byte
        # grams and window-w minima, any shared run of ≥ k + w − 1 bytes
        # shares a selected fingerprint VALUE — so k = min_len − w + 1
        # catches every shared substring of length ≥ min_len chars (a char
        # is ≥ 1 UTF-8 byte) while emitting ~2/(w+1) fingerprints per
        # character instead of 1. The previous per-position nomination
        # exploded a boilerplate-heavy 20k-page corpus into ~19M posting
        # rows and a 395 s edge phase; winnowing cuts posting volume ~8×
        # with zero recall change (grouping may only get COARSER — docs
        # sharing a ≥k-byte-but-<min_len run can land in one group — and
        # the per-group suffix array rejects exactly those, so the output
        # pair set is unchanged; pinned by the brute-force equality tests).
        postings = substring_postings(slim, text_col, key_col, min_len, sample)

    if sample <= 1:
        # postings flow straight into the star-edge window (single
        # consumer — no persist); the star edges feed CC + node derivation
        pairs = None  # groups are exact; no per-pair nomination needed
        grouping_edges = _star_edges(postings, key_col).persist()
    else:
        pairs, _hot = fingerprint_candidate_pairs(
            docs, text_col, key_col, min_len, sample, max_bucket_size,
            fps=postings,
        )
        pairs = pairs.persist()
        grouping_edges = pairs
    if temps is not None:
        temps.append(grouping_edges)

    return _grouped_verify(
        grouping_edges, slim, key_col, text_col, min_len, sample,
        max_group_docs, pairs, exact_lcs, temps=temps,
    )


def _grouped_verify(
    grouping_edges: DataFrame,
    slim: DataFrame,
    key_col: str,
    text_col: str,
    min_len: int,
    sample: int,
    max_group_docs: int,
    pairs: DataFrame | None,
    exact_lcs: bool = False,
    temps: list[DataFrame] | None = None,
) -> DataFrame:
    """Nomination graph → verified substring edges (key_l, key_r, span_len).

    Shared tail of the batch (`substring_edges`) and incremental
    (`incremental_substring_edges`) paths: connected-components-group the
    nomination edges, run one suffix array per small group (each member's
    text shipped once), and emit spanning-certificate star edges for
    oversized near-clique components. ``pairs`` (sampled mode only)
    restricts small-group output to nominated pairs. ``exact_lcs`` upgrades
    small-group span_len to the true pairwise LCS (certificate edges stay
    min_len lower bounds — their whole point is to avoid per-pair work).
    ``temps`` collects the persists this function pins, for callers that
    materialize the result internally and can release them.
    """
    from .components import connected_components

    nodes = (
        grouping_edges.select(F.col("key_l").alias(key_col))
        .union(grouping_edges.select(F.col("key_r").alias(key_col)))
        .distinct()
    )
    comp = connected_components(
        grouping_edges, nodes, key_col, nodes_unique=True, edges_unique=True
    )
    gsizes = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("_gsz"))
    comp = comp.join(gsizes, "cluster_id").persist()
    if temps is not None:
        # callers that materialize internally (incremental append) release
        # this persist once their result is checkpointed
        temps.append(comp)

    # ---- small components: one SA per group, each text shipped once
    small = (
        comp.filter(F.col("_gsz") <= max_group_docs)
        .join(slim, key_col)
        .select(F.col("cluster_id"), F.col(key_col).alias("url"), F.col(text_col).alias("text"))
    )

    def verify_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return _group_spans(pdf, min_len, exact_lcs)

    # schema follows the caller's key type (string urls, long doc_ids, …) —
    # a hard-coded string schema crashed long-keyed callers at Arrow time
    key_dt = dict(slim.dtypes)[key_col]
    small_edges = small.groupBy("cluster_id").applyInPandas(
        verify_group, f"key_l {key_dt}, key_r {key_dt}, span_len long"
    )
    if pairs is not None:
        # sampled fingerprints: the group SA emits every pair sharing an
        # L-gram, including pairs the sampled join never nominated — keep
        # the candidate-pair contract by restricting to nominated pairs
        small_edges = small_edges.join(pairs, ["key_l", "key_r"], "left_semi")

    # ---- oversized components: spanning CERTIFICATE edges, not O(n²) pairs.
    #
    # Web-scale boilerplate creates near-clique components (a site paragraph
    # ≥ min_len shared by every page of a site chains thousands of docs);
    # the true pair set of such a component is Ω(n²) BY CONSTRUCTION, so
    # any per-pair enumeration — however bounded per task — is quadratic
    # work and quadratic output (measured: one 6,397-doc component drove a
    # 20k-page edge phase to ~400 s). What downstream clustering needs is
    # the component, not the clique: emit per-fingerprint STAR edges
    # (fp-rep → member) over the oversized members' min_len-gram
    # fingerprints. Sharing a min_len-gram hash IS the certificate of a
    # shared min_len-char substring (modulo 64-bit collision — the same
    # trust already placed in every hashed-shingle comparison here), so
    # every emitted edge is a true substring edge with span_len ≥ min_len,
    # and every true pair shares ≥ 1 such fingerprint, making the star
    # graph's connected components EQUAL to the true pair graph's. O(n)
    # edges, O(postings) work. Small components keep full SA-verified
    # pair output; only oversized ones degrade to the certificate, which
    # is the only scalable contract for them.
    big_keys = comp.filter(F.col("_gsz") > max_group_docs).select(
        F.col(key_col).alias("_bigk")
    )
    big_docs = slim.join(
        F.broadcast(big_keys.withColumnRenamed("_bigk", key_col)),
        key_col,
        "left_semi",
    )
    cert_fps = big_docs.select(
        F.col(key_col),
        F.explode(
            F.array_distinct(fingerprints(F.col(text_col), min_len, sample))
        ).alias("fp"),
    )
    big_edges = _star_edges(cert_fps, key_col).withColumn(
        "span_len", F.lit(min_len).cast("long")
    )
    return small_edges.unionByName(big_edges)


def incremental_substring_edges(
    docs: DataFrame,
    new_docs: DataFrame,
    existing_postings: DataFrame,
    text_col: str = "text",
    key_col: str = "url",
    min_len: int = 32,
    sample: int = 1,
    max_bucket_size: int = 200,
    max_group_docs: int = 256,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(edges, updated postings state, NEW-batch postings delta).

    The third element is the postings of the appended batch alone — the
    increment a segment-append checkpoint commits (O(new batch) I/O; the
    union of committed segments reconstructs the full state), while the
    second is the in-memory view existing ∪ new for chaining appends.

    The incremental-append analog of ``substring_edges`` (the reference's
    append path rebuilds everything, api_server.py:848-877 — append ≡
    rebuild is its consistency contract; this keeps the contract while
    fingerprinting only the appended batch). ``docs`` carries (key, text)
    for existing ∪ new (texts are shipped only for touched groups),
    ``new_docs`` the appended batch, ``existing_postings`` the persisted
    ``substring_postings`` state of the existing corpus.

    Why this is exact: "share a run of ≥ min_len chars" is a PAIRWISE
    property certified by a shared fingerprint VALUE (winnowing guarantee
    at sample<=1; sampled contract otherwise), so (a) old×old edges are
    untouched by an append — the existing edge state already covers them —
    and (b) every edge touching a new doc is witnessed by a fingerprint
    value present in the NEW batch's postings. Restricting the nomination
    graph to postings whose fp appears in the new batch (one semi-join)
    therefore loses nothing; the per-group suffix array then verifies
    exactly as in batch. Grouping uses the same O(postings) star-edge
    construction as the batch path rather than a pairwise new×all bucket
    join — pairwise nomination on a boilerplate fingerprint shared by the
    batch AND 10⁵ corpus docs is the Ω(n·m) blowup the batch path already
    removed; the star/CC/SA route caps it at O(touched postings). In
    sampled mode (no grouping-exactness guarantee) nomination IS pairwise
    by contract, and runs through ``salted_bipartite_pairs`` — both sides
    salted, bounded cells, zero drops.

    Oversized touched components emit the same spanning-certificate star
    edges as batch (true edges, span_len = min_len lower bound). All exact-
    mode output is then restricted to new-touching pairs: old×old rows —
    SA re-derivations or certificate edges alike — are true pairs, hence
    already connected in the existing edge state (every certificate edge
    joins two docs sharing a min_len-gram, a pair the PRIOR run's output
    connects by its own CC-equivalence contract), so dropping them changes
    neither the edge-union semantics nor the clusters.
    """
    from .buckets import salted_bipartite_pairs

    slim = docs.select(F.col(key_col), F.col(text_col))
    new_slim = new_docs.select(F.col(key_col), F.col(text_col))
    # localCheckpoint, not persist: materialized batch-sized state that
    # survives as the lineage root of the returned postings without
    # accumulating storage-tier entries across chained appends
    new_post = substring_postings(
        new_slim, text_col, key_col, min_len, sample
    ).localCheckpoint()
    all_post = existing_postings.select(key_col, "fp").unionByName(new_post)
    # only fingerprint VALUES present in the new batch can witness an edge
    # touching a new doc
    touched = all_post.join(new_post.select("fp").distinct(), "fp", "left_semi")

    temps: list[DataFrame] = []
    if sample <= 1:
        grouping_edges = _star_edges(touched, key_col).persist()
        pairs = None
    else:
        # the bipartite generator scans its all-side twice (hot-bucket
        # sizing + salt tagging) — materialize the semi-joined state once
        touched = touched.persist()
        temps.append(touched)
        pairs, _hot = salted_bipartite_pairs(
            new_post, touched, ["fp"], key_col, max_bucket_size
        )
        pairs = pairs.distinct().persist()
        grouping_edges = pairs
    temps.append(grouping_edges)

    edges = _grouped_verify(
        grouping_edges, slim, key_col, text_col, min_len, sample,
        max_group_docs, pairs, temps=temps,
    )
    # drop old×old rows (exact-mode SA re-derivations and certificate star
    # edges in either mode) — complete/connected in the existing state per
    # the docstring argument. One linear plan (two left joins + flag
    # filter), NOT two semi-join branches: a branched plan re-executes the
    # per-group suffix-array verification once per branch.
    nk = new_slim.select(F.col(key_col))
    flag_l = nk.select(F.col(key_col).alias("key_l"), F.lit(True).alias("_nl"))
    flag_r = nk.select(F.col(key_col).alias("key_r"), F.lit(True).alias("_nr"))
    edges = (
        edges.join(F.broadcast(flag_l), "key_l", "left")
        .join(F.broadcast(flag_r), "key_r", "left")
        .where(F.col("_nl") | F.col("_nr"))
        .select("key_l", "key_r", "span_len")
    )
    # materialize the (small) edge delta, then release every intermediate
    # this call pinned — chained appends must not accumulate cached state
    edges = edges.localCheckpoint()
    for df in temps:
        df.unpersist()
    return edges, all_post, new_post
