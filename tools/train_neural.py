"""Train the E15 neural leaf-sequence classifier and print the frozen
literal for ``extractors/neural.py::FROZEN_WEIGHTS``.

Usage:
    python tools/train_neural.py [sf_dir]

Training data = gold-labeled template leaves from ``sf_dir`` (default
/root/testdata/sf0.01) + the seeded adversarial pages; features are
word-bag + tag-path-bag over the TRAINED vocabulary with prev/next-leaf
context concat (BoilerNet's modeling shape).  The held-out split
(doc_id % 7 == 5) is NEVER trained on and never feeds the vocabulary;
the report shows the frozen model beating the density rule there.  Per
the frozen-model invariant (CLAUDE.md), pasting new weights into
neural.py requires re-verifying the extraction oracle in the same
commit:

    python tools/check_oracles.py /root/testdata/sf0.001 neural_extract
    python tools/check_oracles.py /root/testdata/sf0.01 neural_extract
"""

import json
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from web_content_extraction_benchmark_spark.extractors import neural_training as nt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    X, y, ids, rule, word_vocab, tag_vocab = nt.build_dataset(docs)
    held = nt.heldout_mask(ids)
    weights = nt.train_mlp(X[~held], y[~held])
    weights["word_vocab"] = word_vocab
    weights["tag_vocab"] = tag_vocab

    logits = nt.predict_logits(weights, X)
    pred = (logits > 0).astype(np.float64)
    print(f"leaves: {len(y)} (train {int((~held).sum())}, "
          f"held-out {int(held.sum())}); input dim {X.shape[1]}")
    print(f"word vocab ({len(word_vocab)}): {word_vocab}")
    print(f"tag vocab ({len(tag_vocab)}): {tag_vocab}")
    print(f"train accuracy:    model {nt.accuracy(pred[~held], y[~held]):.6f}"
          f"  density {nt.accuracy(rule[~held], y[~held]):.6f}")
    print(f"held-out accuracy: model {nt.accuracy(pred[held], y[held]):.6f}"
          f"  density {nt.accuracy(rule[held], y[held]):.6f}")
    tmpl = ids < nt.ADV_DOC_ID_BASE
    print(f"template-leaf agreement with gold: "
          f"{nt.accuracy(pred[tmpl], y[tmpl]):.6f}")
    print(f"min |logit| on template leaves: "
          f"{np.abs(logits[tmpl]).min():.4f}")
    print(f"min |logit| overall: {np.abs(logits).min():.4f}")
    print("\nFROZEN_WEIGHTS = " + json.dumps(weights, indent=1))


if __name__ == "__main__":
    main()
