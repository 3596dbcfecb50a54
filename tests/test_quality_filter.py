"""QualityFilter (fused C4+Gopher verdict) rule-by-rule on crafted docs."""

import numpy as np
import pyarrow as pa
import ray.data

from linkgraph.ops import quality_filter

GOOD = (
    "The quick brown fox jumps over the lazy dog and it runs far away "
    "to the green hills where a small river flows by an old stone mill "
    "and this is that place for everyone to visit on a warm day in June"
)


def _run(texts):
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    )
    df = quality_filter(ds).to_pandas().sort_values("doc_id")
    return df["keep"].to_numpy(), df["reasons"].to_numpy()


def test_good_doc_kept():
    keep, reasons = _run([GOOD])
    assert keep[0] == 1 and reasons[0] == 0


def test_each_rule_fires():
    short = "the cat sat on a mat for it was warm there that day"  # < 30 tokens
    longtoks = " ".join(["the", "of", "and"] * 6 + ["supercalifragilisticexpialidocious"] * 36)
    nostop = " ".join(f"word{i} thing{i} object{i}" for i in range(20))
    punct = GOOD + " " + "!?;:,.#@$%^&*()" * 40
    repeats = "the big dog and " * 30  # one dominant 2-gram chain
    keep, reasons = _run([short, longtoks, nostop, punct, repeats])
    assert (keep == 0).all()
    assert reasons[0] & 1  # too few tokens
    assert reasons[1] & 2  # mean token length out of range
    assert reasons[2] & 4  # stopword ratio too low
    assert reasons[3] & 8  # punctuation ratio too high
    assert reasons[4] & 16 and reasons[4] & 32  # dup + top-gram coverage


def test_empty_text():
    keep, reasons = _run([""])
    assert keep[0] == 0 and reasons[0] & 1 and reasons[0] & 2
