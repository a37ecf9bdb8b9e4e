"""Regenerate the canonical language-ID classifier weights.

Trains the one-vs-rest hashed-char-bigram logistic models on the fixed
fixture (``operators/langid.py::training_fixture`` — scale-independent, so
the weights are constants) and rewrites the ``LANGID_WEIGHTS`` block in
``operators/langid.py``. Deterministic: re-running reproduces the same
floats bit-for-bit (DECIMAL-summed gradients; the pin test re-asserts this
every suite run).

    python scripts/train_langid.py
"""

from __future__ import annotations

import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    from clickhouse_etl_loadtest_spark.operators.langid import train_langid_weights
    from clickhouse_etl_loadtest_spark.session import get_spark

    spark = get_spark(app_name="train-langid", shuffle_partitions=4)
    weights = train_langid_weights(spark)

    # training-set accuracy report (sanity, printed not stored)
    from clickhouse_etl_loadtest_spark.operators.langid import (
        LANGS,
        features_py,
        training_fixture,
    )

    correct = 0
    fixture = training_fixture()
    for lang, text in fixture:
        x = features_py(text)
        scores = {
            l: w[0] + sum(wj * xj for wj, xj in zip(w[1:], x))
            for l, w in weights.items()
        }
        pred = sorted(LANGS, key=lambda l: (-scores[l], l))[0]
        correct += pred == lang
    print(f"training accuracy: {correct}/{len(fixture)}")

    lines = ["LANGID_WEIGHTS: dict[str, list[float]] = {"]
    for lang in LANGS:
        ws = ", ".join(repr(w) for w in weights[lang])
        lines.append(f'    "{lang}": [{ws}],')
    lines.append("}")
    block = "\n".join(lines) + "\n"

    path = (
        pathlib.Path(__file__).resolve().parent.parent
        / "clickhouse_etl_loadtest_spark"
        / "operators"
        / "langid.py"
    )
    text = path.read_text()
    new, n_subs = re.subn(
        r"LANGID_WEIGHTS: dict\[str, list\[float\]\] = \{[^}]*\}\n",
        block,
        text,
        count=1,
        flags=re.DOTALL,
    )
    assert n_subs == 1, "LANGID_WEIGHTS block not found in langid.py — nothing rewritten"
    path.write_text(new)
    print(f"rewrote LANGID_WEIGHTS in {path}")


if __name__ == "__main__":
    main()
