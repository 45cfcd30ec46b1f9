"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md §1).

Schema matches BASELINE.json ``input_hint``: (url string, warc_ts timestamp,
html binary, text string, lang string) — ``text`` is filled downstream by the
extractor; this module produces the raw pages plus a ``group_id``/``kind``
ground-truth hint for tests.

Every page is a pure function of ``(seed, row_index)`` — no global RNG state,
no ``now()`` — so generation is embarrassingly parallel (``spark.range(n)
.mapInPandas``) and byte-identical at any partitioning/parallelism, which the
determinism tests and the local[8]-vs-local[32] scaling bench rely on.

Planted duplicate structure (drives golden clusters; truth for recall is the
brute-force exact-Jaccard oracle in tests/oracle_bruteforce.py, per
SURVEY.md §5):

* blocks of 8 consecutive docs; block kind cycles 0..5:
  0 exact copies, 1 near-dups (k char/word edits, k∈{1,3,10}),
  2 paragraph-shuffled copies, 3 superset/substring pairs,
  4 boilerplate-only overlap (shared site paragraph inside the body — the
    hot-LSH-bucket skew stressor; must NOT verify at high Jaccard),
  5 singletons.
"""

from __future__ import annotations

import random
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd

BLOCK = 8
MIN_SITES = 20
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def n_sites_for(n_docs: int) -> int:
    """Site count grows with the corpus (one site per ~64 docs, ≥ 20).

    A fixed site count would make per-site boilerplate groups grow linearly
    with corpus size and their candidate pairs quadratically — unrealistic for
    a web crawl and a benchmark artifact rather than a skew test. Hot-bucket
    capping is exercised explicitly in tests instead."""
    return max(MIN_SITES, n_docs // 64)

_VOCAB_EN = (
    "page web crawl data spark shuffle join filter window batch stream table "
    "row column value query sort merge hash scan group order key index store "
    "cache block chunk token text document cluster signature band bucket "
    "shingle sample vector metric score record field parse encode decode"
).split()
_VOCAB_TR = (
    "sayfa veri tablo satır sütun değer sorgu sıralama birleştirme anahtar "
    "kullanıcı uygulama sürüm cihaz şebeke bağlantı hata kayıt çözüm deneme "
    "güncelleme mesaj ekran açılış kapanış işlem bellek depolama ağ sinyal"
).split()
_VOCAB = _VOCAB_EN + _VOCAB_TR

# Jira-ish constructs sprinkled into some bodies so pipeline-level tests also
# exercise the extractor's masking/markup paths (SURVEY.md §2.8).
_CONSTRUCTS = [
    "*Test Steps:*\r\n# open app\r\n# tap send\r\n",
    "{code}stack trace line{code}\n",
    "contact dev@example.com or 0532 123 45 67\n",
    "see https://www.example.com/kb/article?id=42. for details\n",
    "Msisdn : 905368658527\nDevice : iPhone12,5\n",
    "h2. Background\nbq. quoted remark\n",
    "Application Version : 3.70.16 on IOS – “fast” path\n",
    "SERVER_LOG_ID ABCDEF123456 at 10.0.0.1\n",
]

_LANGS = ["tr", "en", "unknown"]


def _rng(seed: int, *keys: int) -> random.Random:
    x = seed & 0xFFFFFFFF
    for k in keys:
        x = (x * 1000003 + k + 0x9E3779B9) & 0xFFFFFFFFFFFFFFFF
    return random.Random(x)


def _sentences(rng: random.Random, n_sent: int) -> list[str]:
    out = []
    for _ in range(n_sent):
        n_words = rng.randint(8, 16)
        out.append(" ".join(rng.choice(_VOCAB) for _ in range(n_words)))
    return out


def _site_paragraph(seed: int, site: int) -> str:
    rng = _rng(seed, 0xB01, site)
    return " ".join(rng.choice(_VOCAB_EN) for _ in range(60))


def _block_kind(block: int) -> int:
    return block % 6


def _group_size(block: int) -> int:
    # members 0..gsize-1 of the block form the planted group
    return 2 + (block % 3)


def page_body(seed: int, i: int, n_sites: int = MIN_SITES) -> tuple[str, int, int]:
    """Return (raw_body, group_id, kind) for global row index ``i``.

    group_id is a *hint*: docs sharing group_id were generated from the same
    base; whether they must cluster is decided by the brute-force oracle.
    Singletons get group_id = -1 - i (unique).
    """
    block, member = divmod(i, BLOCK)
    kind = _block_kind(block)
    site = block % n_sites
    base_rng = _rng(seed, 0xD0C, block)
    base_sents = _sentences(base_rng, base_rng.randint(8, 15))

    in_group = kind <= 3 and member < _group_size(block)
    group_id = block if in_group else -1 - i

    if kind == 4:
        # boilerplate-only overlap: shared site paragraph + unique tail
        uniq = _sentences(_rng(seed, 0xF00, block, member), 3)
        body = _site_paragraph(seed, site) + ". " + ". ".join(uniq) + "."
    elif not in_group:
        body = ". ".join(_sentences(_rng(seed, 0x51E, block, member), base_rng.randint(6, 12))) + "."
    elif kind == 0:  # exact copies
        body = ". ".join(base_sents) + "."
    elif kind == 1:  # near-dup with k word edits
        k = (1, 3, 10)[member % 3]
        words = (". ".join(base_sents) + ".").split(" ")
        erng = _rng(seed, 0xED17, block, member)
        for _ in range(min(k, max(1, len(words) // 4))):
            words[erng.randrange(len(words))] = erng.choice(_VOCAB)
        body = " ".join(words)
    elif kind == 2:  # paragraph-shuffled copy
        sents = list(base_sents)
        _rng(seed, 0x5F1E, block, member).shuffle(sents)
        body = ". ".join(sents) + "."
    else:  # kind == 3: superset — member m appends m extra sentences
        extra = _sentences(_rng(seed, 0xADD, block, member), member)
        body = ". ".join(base_sents + extra) + "."

    # sprinkle extractor constructs deterministically on ~1/4 of base docs;
    # group members share the same prefix so edits stay the only difference
    crng = _rng(seed, 0xC0DE, block if in_group or kind == 0 else i)
    if crng.random() < 0.25:
        body = crng.choice(_CONSTRUCTS) + body
    return body, group_id, kind


def page_row(seed: int, i: int, n_sites: int = MIN_SITES) -> dict:
    body, group_id, kind = page_body(seed, i, n_sites)
    block = i // BLOCK
    site = block % n_sites
    html = (
        f"<html><head><title>site{site} doc{i}</title></head><body>"
        f"<nav>site{site} navigation home products about contact</nav>"
        f"<!--BODY-->{body}<!--/BODY-->"
        f"<footer>copyright site{site} all rights reserved</footer></body></html>"
    ).encode("utf-8")
    return {
        "url": f"https://site{site}.example/{['a','b','c','d'][i % 4]}/{i}",
        "warc_ts": EPOCH + pd.Timedelta(seconds=i * 37),
        "html": html,
        "lang": _LANGS[i % 3],
        "group_id": group_id,
        "kind": kind,
    }


def generate_pages_pdf(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Small-scale pandas generation for unit tests (single process)."""
    ns = n_sites_for(n_docs)
    return pd.DataFrame([page_row(seed, i, ns) for i in range(n_docs)])


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, lang string, "
    "group_id long, kind int"
)


def generate_pages_df(
    spark,
    n_docs: int,
    seed: int = 42,
    partitions: int | None = None,
    start: int = 0,
    total: int | None = None,
):
    """Distributed generation: spark.range → mapInPandas, pure f(seed, id).

    ``start``/``total`` generate the slice [start, start+n_docs) of a
    ``total``-doc corpus (site count derives from ``total``, so batches of
    one corpus are bit-identical to the same rows of a full generation —
    the CLI append flow relies on this). Defaults reproduce the original
    whole-corpus behavior.
    """
    rng_seed = seed  # capture plain int, not a Spark conf object
    ns = n_sites_for(total if total is not None else start + n_docs)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame([page_row(rng_seed, int(i), ns) for i in b["id"]])

    base = spark.range(start, start + n_docs, numPartitions=partitions)
    return base.mapInPandas(gen, PAGES_SCHEMA)
