"""BPE tokenizer-training ops vs a pure-Python reference trainer."""

import re
from collections import Counter

import pyarrow as pa
import pytest
import ray

CORPUS = [
    "hello hello world",
    "low lower lowest lowest",
    "hello there WORLD 123 low",
    "",
    "a ab abc abcd",
    "xxxxx xx x xxx",  # odd same-symbol runs hit the fixpoint semantics
]


def ref_pair_counts(texts):
    c = Counter()
    for t in texts:
        for w in re.findall(r"[a-z]+", t):
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += 1
    return c


def ref_bpe(texts, n_merges):
    """Reference trainer sharing the fixpoint-replace merge semantics."""
    words = []
    for t in texts:
        words += re.findall(r"[a-z]+", t)
    spaced = [" " + " ".join(w) + " " for w in words]
    merges = []
    for rank in range(1, n_merges + 1):
        c = Counter()
        for s in spaced:
            sym = s.strip().split(" ")
            for i in range(len(sym) - 1):
                c[sym[i] + " " + sym[i + 1]] += 1
        if not c:
            break
        n = max(c.values())
        pair = min(p for p, v in c.items() if v == n)
        pat, rep = " " + pair + " ", " " + pair.replace(" ", "") + " "
        nxt = []
        for s in spaced:
            while pat in s:
                s = s.replace(pat, rep)
            nxt.append(s)
        spaced = nxt
        merges.append((rank, pair, pair.replace(" ", ""), n))
    return merges


def docs_ds():
    return ray.data.from_arrow(
        pa.table({"text": pa.array(CORPUS)})
    ).repartition(4)


def test_bpe_pair_counts_exact():
    from linkgraph.ops.bpe import bpe_pair_counts

    got = bpe_pair_counts(docs_ds(), k=1000)
    want = ref_pair_counts(CORPUS)
    assert dict(zip(got["pair"], got["n"])) == dict(want)
    # top-k ordering: n desc, pair asc
    rows = list(zip(got["n"], got["pair"]))
    assert rows == sorted(rows, key=lambda r: (-r[0], r[1]))


def test_bpe_learn_vs_reference():
    from linkgraph.ops.bpe import bpe_learn

    got = bpe_learn(docs_ds(), n_merges=4)
    want = ref_bpe(CORPUS, 4)
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_bpe_learn_empty_corpus():
    from linkgraph.ops.bpe import bpe_learn

    docs = ray.data.from_arrow(pa.table({"text": pa.array(["123 !!!", ""])}))
    got = bpe_learn(docs, n_merges=2)
    assert len(got) == 0
    assert list(got.columns) == ["rank", "pair", "merged", "n"]


def test_word_freq_partition_invariance():
    from linkgraph.ops.bpe import word_freq

    a = word_freq(docs_ds()).to_pandas().sort_values("w").reset_index(drop=True)
    b = (
        word_freq(
            ray.data.from_arrow(pa.table({"text": pa.array(CORPUS)})).repartition(1)
        )
        .to_pandas()
        .sort_values("w")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_bpe_encode_counts_vs_reference():
    from linkgraph.ops.bpe import bpe_encode_counts

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(CORPUS))), pa.int64()),
                "text": pa.array(CORPUS),
            }
        )
    ).repartition(3)
    got = bpe_encode_counts(ds, n_merges=3).to_pandas()
    got = dict(zip(got["doc_id"].astype(int), got["n_tokens"].astype(int)))

    merges = ref_bpe(CORPUS, 3)
    want = {}
    for i, t in enumerate(CORPUS):
        total = 0
        for w in re.findall(r"[a-z]+", t):
            s = " " + " ".join(w) + " "
            for _, pair, merged, _n in merges:
                pat, rep = " " + pair + " ", " " + merged + " "
                while pat in s:
                    s = s.replace(pat, rep)
            total += len(s.strip().split(" "))
        want[i] = total
    assert got == want
    assert want[3] == 0  # empty doc reports 0 tokens
