"""BPE tokenizer-training statistics over the document corpus — the
missing piece of the LLM-training-data layer between token counting
(ops/text.py) and the bigram LM (ops/lm.py): the pair-frequency
censuses a byte-pair-encoding trainer consumes.

Two operators, both exact and hard-oracled:

* ``bpe_pair_counts`` — the first BPE iteration's statistic: counts of
  adjacent character pairs inside ``[a-z]+`` runs of the raw text,
  top-k by (count desc, pair asc).  Fully byte-vectorized: each batch
  concatenates its texts (newline-separated), classifies bytes with
  numpy range masks, and bincounts the 16-bit pair codes — no Python
  loop over rows, no strings on the wire (only the <=65536-row
  (code, cnt) partial table shuffles).

* ``bpe_learn`` — n_merges iterations of the classic trainer on the
  frequency-weighted UNIQUE-WORD table (the standard BPE optimization:
  the corpus collapses to its vocabulary once, then every iteration
  touches vocab-sized data only).  Each iteration is (a) a distributed
  weighted pair count over the spaced-symbol representation, (b) an
  O(1) top-pair pull to the driver, (c) a vectorized fixpoint literal
  replace applied per batch.  The word table stays a Dataset
  throughout; only the single winning pair crosses the driver.

Merge-application semantics (shared bit-for-bit with the SQL oracle):
non-overlapping left-to-right literal replacement of ``" a b "`` with
``" ab "`` in the space-flanked symbol string, repeated until no match
(both Python ``str.replace`` and DuckDB ``replace`` scan identically,
so the fixpoint is identical).  On odd same-symbol runs this fixpoint
can differ from a strict single-scan greedy merge ("x x x x x" ->
"xx x xx" rather than "xx xx x"); the choice is documented, exact and
deterministic on both sides.

(Reference scope analogue: the corpus statistics sinks of SURVEY.md
§2.7 approx/grouped aggregation; no direct reference twin — this is a
beyond-reference LLM-pipeline operator like ops/lm.py.)
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .sortagg import sorted_sum_by

_WORD_RE = re.compile(rb"[a-z]+")


def _pair_code_partial(t: pa.Table) -> pa.Table:
    """(text) batch -> (code uint16 as int64, cnt) partial: adjacent
    lowercase-letter byte pairs within [a-z]+ runs."""
    texts = t.column("text").to_pylist()
    big = ("\n".join(x or "" for x in texts)).encode("utf-8", "surrogatepass")
    arr = np.frombuffer(big, np.uint8)
    if len(arr) < 2:
        return pa.table(
            {"code": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
        )
    valid = (arr >= 97) & (arr <= 122)
    mask = valid[:-1] & valid[1:]
    codes = arr[:-1][mask].astype(np.int64) * 256 + arr[1:][mask]
    cnt = np.bincount(codes, minlength=1 << 16)
    nz = np.flatnonzero(cnt)
    return pa.table(
        {"code": pa.array(nz.astype(np.int64)), "cnt": pa.array(cnt[nz].astype(np.int64))}
    )


def bpe_pair_counts(docs: Dataset, k: int = 20) -> pd.DataFrame:
    """Top-k adjacent character pairs inside [a-z]+ runs of ``text``:
    DataFrame (pair, n), ordered by (n desc, pair asc) — code asc is
    byte-lexicographic, so the int sort IS the string tie-break."""
    partials = docs.select_columns(["text"]).map_batches(
        _pair_code_partial, batch_format="pyarrow"
    )
    folded = sorted_sum_by(partials, "code", sum_cols={"cnt": "cnt"})
    top = folded.sort(["cnt", "code"], descending=[True, False]).limit(k).to_pandas()
    code = top["code"].to_numpy()
    return pd.DataFrame(
        {
            "pair": [chr(c >> 8) + chr(c & 255) for c in code],
            "n": top["cnt"].astype("int64"),
        }
    )


def _word_freq_partial(t: pa.Table) -> pa.Table:
    texts = t.column("text").to_pylist()
    big = ("\n".join(x or "" for x in texts)).encode("utf-8", "surrogatepass")
    words = _WORD_RE.findall(big)
    if not words:
        return pa.table({"w": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    uniq, cnt = np.unique(np.array(words), return_counts=True)
    return pa.table(
        {
            "w": pa.array([x.decode() for x in uniq]),
            "n": pa.array(cnt.astype(np.int64)),
        }
    )


def word_freq(docs: Dataset) -> Dataset:
    """Distributed [a-z]+ word-frequency table: Dataset(w, n)."""
    partials = docs.select_columns(["text"]).map_batches(
        _word_freq_partial, batch_format="pyarrow"
    )
    return sorted_sum_by(partials, "w", sum_cols={"n": "n"})


def _spaced(t: pa.Table) -> pa.Table:
    """Attach the space-flanked symbol representation ' h e l l o '."""
    w = t.column("w").to_pylist()
    s = [" " + " ".join(x) + " " for x in w]
    return pa.table({"s": pa.array(s), "n": t.column("n")})


def _pair_weighted_partial(t: pa.Table) -> pa.Table:
    """(s spaced, n weight) batch -> (pair 'a b', cnt) weighted partial.

    One split over the newline-joined batch: '\\n' tokens mark word
    boundaries (symbols are [a-z]-derived, so newline can never be a
    symbol; NB numpy object-array == uses C-string semantics, so a NUL
    sentinel would compare equal to ''), empty tokens come from the
    flanking spaces; a pair is two adjacent real symbols (same word by
    construction)."""
    s = t.column("s").to_pylist()
    n = t.column("n").to_numpy()
    if not s:
        return pa.table(
            {"pair": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    toks = np.array("\n".join(s).split(" "), dtype=object)
    is_break = (toks == "") | (toks == "\n")
    word_id = np.cumsum(toks == "\n")  # index into n, per token
    ok = ~is_break[:-1] & ~is_break[1:]
    if not ok.any():
        return pa.table(
            {"pair": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    a, b = toks[:-1][ok], toks[1:][ok]
    pairs = np.array([x + " " + y for x, y in zip(a, b)], dtype=object)
    wts = n[word_id[:-1][ok]]
    uniq, inv = np.unique(pairs, return_inverse=True)
    acc = np.zeros(len(uniq), np.int64)
    np.add.at(acc, inv, wts.astype(np.int64))
    return pa.table({"pair": pa.array(list(uniq)), "cnt": pa.array(acc)})


def _top_pair(words: Dataset) -> tuple[str, int] | None:
    partials = words.map_batches(_pair_weighted_partial, batch_format="pyarrow")
    folded = sorted_sum_by(partials, "pair", sum_cols={"cnt": "cnt"})
    top = folded.sort(["cnt", "pair"], descending=[True, False]).limit(1).take_all()
    if not top:
        return None
    return str(top[0]["pair"]), int(top[0]["cnt"])


def bpe_learn(docs: Dataset, n_merges: int = 3) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus: DataFrame
    (rank, pair, merged, n) where n is the pair's corpus frequency at
    selection time.  The vocabulary Dataset stays distributed; each
    iteration ships one (pair, count) row to the driver."""
    # materialize the vocab-sized table so later iterations re-read it
    # instead of re-scanning the corpus (Datasets are lazy; without
    # this, merge r would recount words r times)
    words = word_freq(docs).map_batches(_spaced, batch_format="pyarrow").materialize()
    out = []
    for rank in range(1, n_merges + 1):
        best = _top_pair(words)
        if best is None:
            break
        pair, cnt = best
        merged = pair.replace(" ", "")
        pat, rep = " " + pair + " ", " " + merged + " "

        def apply(t: pa.Table, pat=pat, rep=rep) -> pa.Table:
            col = pd.Series(t.column("s").to_pylist())
            hit = col.str.contains(pat, regex=False)
            while hit.any():
                col[hit] = col[hit].str.replace(pat, rep, regex=False)
                hit = col.str.contains(pat, regex=False)
            return pa.table({"s": pa.array(col.tolist()), "n": t.column("n")})

        words = words.map_batches(apply, batch_format="pyarrow").materialize()
        out.append({"rank": rank, "pair": pair, "merged": merged, "n": cnt})
    return pd.DataFrame(out, columns=["rank", "pair", "merged", "n"]).astype(
        {"rank": "int64", "n": "int64"}
    )


def bpe_encode_counts(
    docs: Dataset, n_merges: int = 3, merges: pd.DataFrame | None = None
) -> Dataset:
    """Tokenize the corpus with learned BPE merges and emit per-doc
    token counts: Dataset(doc_id, n_tokens) where n_tokens is the
    number of symbols after applying the merges (in rank order) to
    every [a-z]+ word.  This is the APPLY pass — the one that streams
    the full corpus — so it is a single map_batches with the (tiny)
    merge list carried in the task closure: per batch, the fixpoint
    replaces run over the batch's UNIQUE words only, then the counts
    broadcast back to word occurrences and sum per doc (exact int64).

    ``merges`` defaults to self-training via :func:`bpe_learn` on the
    same corpus (the oracle-shared setup)."""
    if merges is None:
        merges = bpe_learn(docs, n_merges)
    pats = [
        (" " + p + " ", " " + m + " ")
        for p, m in zip(merges["pair"], merges["merged"])
    ]

    def encode(t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        big = "\n".join(x or "" for x in texts)
        # char offset of each separating newline, from cumulative doc
        # lengths (no per-char scan)
        lens = np.fromiter((len(x or "") for x in texts), np.int64, len(texts))
        bounds = np.cumsum(lens + 1)[:-1] - 1
        starts, words = [], []
        for m in re.finditer(r"[a-z]+", big):
            starts.append(m.start())
            words.append(m.group())
        n_tok = np.zeros(len(doc_ids), np.int64)
        if words:
            doc_idx = np.searchsorted(bounds, np.array(starts, np.int64))
            uw, inv = np.unique(np.array(words, dtype=object), return_inverse=True)
            spaced = pd.Series([" " + " ".join(w) + " " for w in uw])
            for pat, rep in pats:
                hit = spaced.str.contains(pat, regex=False)
                while hit.any():
                    spaced[hit] = spaced[hit].str.replace(pat, rep, regex=False)
                    hit = spaced.str.contains(pat, regex=False)
            counts = (spaced.str.count(" ") - 1).to_numpy().astype(np.int64)
            np.add.at(n_tok, doc_idx, counts[inv])
        return pa.table({"doc_id": pa.array(doc_ids), "n_tokens": pa.array(n_tok)})

    return docs.select_columns(["doc_id", "text"]).map_batches(
        encode, batch_format="pyarrow"
    )
