"""RAKE keyphrase extraction (Rose et al. 2010, "Automatic Keyword
Extraction from Individual Documents") as a two-pass Ray Data pipeline.

The reference extracts structured facts per document (triples, clauses
— ``ie/semantics/ccg.py``); RAKE is the classic LIGHTWEIGHT sibling a
web-corpus curation pipeline runs when full parsing is too expensive:
candidate phrases are the maximal runs of non-stopword tokens
(gaps-and-islands on the stopword flag), each word is scored
``deg(w)/freq(w)`` over all candidate-phrase occurrences corpus-wide
(``deg`` = sum of the host phrase's length, ``freq`` = occurrence
count), and a phrase scores the sum of its word scores; the top-k
phrases per document are the document's keyphrases.

Why this is the 100 TB shape:

* Pass 1 (word statistics) reduces each block to per-word
  ``(freq, deg)`` partials — the exchange is VOCABULARY-bounded, not
  corpus-bounded, exactly like the module-wide word-count idiom.
  The reduced table broadcasts once via ``ray.put``.
* Pass 2 is fully BLOCK-LOCAL: a document's text is one row, so every
  phrase of a document materialises inside one ``map_batches`` block —
  phrase assembly, scoring (dictionary-encode + per-unique probe +
  ``np.add.reduceat`` segment sums) and the per-doc top-k ranking all
  happen without any shuffle.  Nothing doc-keyed is ever exchanged.

Scores are exact scaled integers (``wscore_ppm = deg*1e6 // freq``,
phrase score = integer sum), so the DuckDB oracle
(:func:`rake_oracle_sql` — the same islands via
``i - row_number() OVER (...)``) hash-matches bit-for-bit.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ASCII-only lowercase + token pattern: exact parity with the SQL
# oracle's translate(A-Z, a-z) + regexp_extract_all('[0-9a-z_]+')
# (same convention as stages/textstats.py quality_batch).
_TOKEN_RE = r"[0-9a-z_]+"

_PPM = 1_000_000


def _default_stopwords() -> List[str]:
    from ie_ray.stages.textstats import _STOPWORDS_EN
    return sorted(_STOPWORDS_EN)


def _explode_islands(t: pa.Table, stop: List[str]):
    """Block kernel shared by both passes: returns a polars frame of
    non-stopword token occurrences with (row, island, word) plus the
    island length — one vectorized pipeline, no Python per row."""
    import polars as pl
    texts = pc.ascii_lower(pc.cast(t.column("text"), pa.large_string()))
    df = pl.DataFrame({
        "doc_id": pl.from_arrow(t.column("doc_id")),
        "w": pl.from_arrow(texts).str.extract_all(_TOKEN_RE),
    }).with_row_index("row").explode("w").drop_nulls("w")
    if df.height == 0:
        return df.with_columns(pl.lit(0, dtype=pl.UInt32).alias("isl"),
                               pl.lit(0, dtype=pl.UInt32).alias("len"))
    df = df.with_columns(pl.col("w").is_in(stop).alias("stop"))
    # gaps-and-islands: island id = running count of stopword rows
    # (cum_sum restarts make no difference — (row, isl) is the key)
    df = df.with_columns(
        pl.col("stop").cast(pl.UInt32).cum_sum().alias("isl"))
    df = df.filter(~pl.col("stop")).drop("stop")
    return df.with_columns(
        pl.len().over(["row", "isl"]).alias("len"))


def word_stat_partial(t: pa.Table,
                      stop: Optional[List[str]] = None) -> pa.Table:
    """Per-block RAKE word partials: (word, freq, deg) — freq counts
    candidate-phrase occurrences of the word, deg sums the host
    phrase's word count.  Output is block-vocabulary-bounded."""
    import polars as pl
    df = _explode_islands(t, stop or _default_stopwords())
    if df.height == 0:
        return pa.table({"word": pa.array([], type=pa.string()),
                         "freq": pa.array([], type=pa.int64()),
                         "deg": pa.array([], type=pa.int64())})
    g = df.group_by("w").agg(
        pl.len().cast(pl.Int64).alias("freq"),
        pl.col("len").cast(pl.Int64).sum().alias("deg"))
    out = g.rename({"w": "word"}).to_arrow()
    return out.set_column(0, "word", out.column("word").cast(pa.string()))


def word_scores(docs, stop: Optional[List[str]] = None) -> Dict[str, int]:
    """Corpus-wide word score table ``word -> deg*1e6 // freq``.
    The groupby output is vocabulary-bounded — the only exchange in
    the whole operator — and small enough to broadcast."""
    from ray.data.aggregate import Sum
    stop = stop or _default_stopwords()
    agg = (docs.map_batches(lambda t: word_stat_partial(t, stop),
                            batch_format="pyarrow")
           .groupby("word").aggregate(Sum("freq"), Sum("deg")))
    scores: Dict[str, int] = {}
    for blk in agg.iter_batches(batch_format="pyarrow"):
        if blk.num_rows == 0 or "word" not in blk.column_names:
            continue
        words = blk.column("word").to_pylist()
        freq = np.asarray(blk.column("sum(freq)"), dtype=np.int64)
        deg = np.asarray(blk.column("sum(deg)"), dtype=np.int64)
        sc = deg * _PPM // freq
        scores.update(zip(words, sc.tolist()))
    return scores


def rake_keyphrases(docs, top_k: int = 3,
                    stop: Optional[List[str]] = None):
    """Top-``top_k`` RAKE keyphrases per document.

    Returns a Dataset with columns (doc_id, phrase, score_ppm, rank);
    rank orders by (score desc, phrase asc) over the document's
    DISTINCT candidate phrases.  Pass 2 is block-local (see module
    docstring) — the broadcast word-score dict is the only state.
    """
    import ray

    stop = stop or _default_stopwords()
    scores_ref = ray.put(word_scores(docs, stop))

    class ScoreBlock:
        def __init__(self):
            self.scores = ray.get(scores_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            import polars as pl
            df = _explode_islands(t, stop)
            empty = pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "phrase": pa.array([], type=pa.string()),
                "score_ppm": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64())})
            if df.height == 0:
                return empty
            # score per word occurrence: probe the broadcast dict once
            # per DISTINCT word in the block, then numpy-gather
            warr = df.get_column("w").to_arrow()
            enc = pc.dictionary_encode(
                warr.combine_chunks() if isinstance(warr, pa.ChunkedArray)
                else warr)
            uniq = enc.dictionary.to_pylist()
            lut = np.fromiter((self.scores.get(u, 0) for u in uniq),
                              dtype=np.int64, count=len(uniq))
            ws = lut[np.asarray(enc.indices, dtype=np.int64)]
            df = df.with_columns(pl.Series("wscore", ws))
            ph = (df.group_by(["row", "isl"], maintain_order=False)
                  .agg(pl.col("doc_id").first(),
                       pl.col("w").str.join(" ").alias("phrase"),
                       pl.col("wscore").sum().alias("score_ppm")))
            ph = ph.unique(subset=["doc_id", "phrase", "score_ppm"])
            ph = (ph.sort(["doc_id", "score_ppm", "phrase"],
                          descending=[False, True, False])
                  .with_columns(pl.col("phrase").cum_count()
                                .over("doc_id").alias("rank"))
                  .filter(pl.col("rank") <= top_k))
            out = ph.select(["doc_id", "phrase", "score_ppm", "rank"]) \
                .to_arrow()
            return pa.table({
                "doc_id": out.column("doc_id").cast(pa.int64()),
                "phrase": out.column("phrase").cast(pa.string()),
                "score_ppm": out.column("score_ppm").cast(pa.int64()),
                "rank": out.column("rank").cast(pa.int64())})

    return docs.map_batches(ScoreBlock, concurrency=(1, 8),
                            batch_format="pyarrow")


def rake_oracle_sql(top_k: int = 3,
                    stop: Optional[Iterable[str]] = None) -> str:
    """Exact DuckDB twin: same tokens, same islands (row_number gap
    trick), same integer-ppm scores, same (score desc, phrase asc)
    rank."""
    stop_list = ", ".join("'%s'" % s for s in (stop or _default_stopwords()))
    return (
        "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all("
        "translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
        "'abcdefghijklmnopqrstuvwxyz'), '[0-9a-z_]+')) AS w, "
        "generate_subscripts(regexp_extract_all(translate(text, "
        "'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), "
        "'[0-9a-z_]+'), 1) AS i FROM documents), "
        "isl AS (SELECT doc_id, w, i, "
        "i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp "
        "FROM toks WHERE w NOT IN (%s)), "
        "ph AS (SELECT doc_id, grp, string_agg(w, ' ' ORDER BY i) "
        "AS phrase, count(*)::BIGINT AS len FROM isl GROUP BY 1, 2), "
        "ws AS (SELECT w, (sum(ph.len) * 1000000) // count(*) AS wscore "
        "FROM isl JOIN ph ON ph.doc_id = isl.doc_id "
        "AND ph.grp = isl.grp GROUP BY w), "
        "psc AS (SELECT isl.doc_id, isl.grp, ph.phrase, "
        "sum(ws.wscore)::BIGINT AS score_ppm FROM isl "
        "JOIN ws ON ws.w = isl.w JOIN ph ON ph.doc_id = isl.doc_id "
        "AND ph.grp = isl.grp GROUP BY 1, 2, 3), "
        "dp AS (SELECT DISTINCT doc_id, phrase, score_ppm FROM psc), "
        "r AS (SELECT doc_id, phrase, score_ppm, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY score_ppm DESC, phrase) AS rank "
        "FROM dp) "
        "SELECT doc_id, phrase, score_ppm, rank::BIGINT AS rank FROM r "
        "WHERE rank <= %d ORDER BY doc_id, rank" % (stop_list, top_k))


def rake_bruteforce(rows: List[Tuple[int, str]], top_k: int = 3,
                    stop: Optional[Iterable[str]] = None):
    """O(corpus) single-process twin for tests."""
    import re
    stopset = set(stop or _default_stopwords())
    lower = str.maketrans("ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                          "abcdefghijklmnopqrstuvwxyz")
    freq: Dict[str, int] = {}
    deg: Dict[str, int] = {}
    phrases: List[Tuple[int, Tuple[str, ...]]] = []
    for doc_id, text in rows:
        words = re.findall(_TOKEN_RE, (text or "").translate(lower))
        cur: List[str] = []
        for w in words + ["the"]:          # sentinel flushes the tail
            if w in stopset:
                if cur:
                    phrases.append((doc_id, tuple(cur)))
                    for x in cur:
                        freq[x] = freq.get(x, 0) + 1
                        deg[x] = deg.get(x, 0) + len(cur)
                    cur = []
            else:
                cur.append(w)
    wscore = {w: deg[w] * _PPM // freq[w] for w in freq}
    per_doc: Dict[int, set] = {}
    for doc_id, ws in phrases:
        per_doc.setdefault(doc_id, set()).add(
            (" ".join(ws), sum(wscore[w] for w in ws)))
    out = []
    for doc_id in sorted(per_doc):
        ranked = sorted(per_doc[doc_id], key=lambda p: (-p[1], p[0]))
        for rank, (phrase, score) in enumerate(ranked[:top_k], 1):
            out.append((doc_id, phrase, score, rank))
    return out
