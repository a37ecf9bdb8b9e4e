"""Trained language-ID classifier (operators/langid.py +
queries/text.py::doc_language_id_clf): the weights-constants pin, the
upgrade-over-heuristic differential, and fixture determinism.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.parquet as pq

from clickhouse_etl_loadtest_spark.operators.langid import (
    LANGID_WEIGHTS,
    LANGS,
    N_BUCKETS,
    TRANSLATIONS,
    features_py,
    train_langid_weights,
    training_fixture,
)
from clickhouse_etl_loadtest_spark.queries import load_all

from .oracle_harness import TABLES

REG = load_all()


def test_training_fixture_is_deterministic_and_balanced():
    fx = training_fixture()
    assert fx == training_fixture()
    by_lang = {}
    for lang, text in fx:
        by_lang.setdefault(lang, []).append(text)
    assert sorted(by_lang) == sorted(LANGS)
    assert all(len(v) == 25 for v in by_lang.values())
    # every language's rendering is distinct from English's for the
    # non-identity entries (the signal the classifier learns) — and the
    # close Romance pairs are mutually distinct too (the trigram family's
    # reason to exist)
    for lang in LANGS:
        if lang != "en":
            assert by_lang[lang] != by_lang["en"]
    assert by_lang["pt"] != by_lang["es"]
    assert by_lang["it"] != by_lang["es"]


def test_weights_pin_retrain_reproduces_constants(spark):
    """The canonical LANGID_WEIGHTS constants must be exactly reproducible
    by re-running the training (DECIMAL-summed gradients are exact and
    order-independent; everything else is deterministic IEEE arithmetic) —
    the pin that keeps the baked constants honest."""
    retrained = train_langid_weights(spark)
    assert set(retrained) == set(LANGID_WEIGHTS)
    for lang in LANGS:
        assert retrained[lang] == LANGID_WEIGHTS[lang], lang


def test_training_set_is_fully_separated():
    """100% training accuracy with the pinned constants (scored through the
    same Python feature twin the training featurizer uses)."""
    for lang, text in training_fixture():
        x = features_py(text)
        scores = {
            l: w[0] + sum(wj * xj for wj, xj in zip(w[1:], x))
            for l, w in LANGID_WEIGHTS.items()
        }
        assert sorted(LANGS, key=lambda l: (-scores[l], l))[0] == lang


def _multilingual_fixture_dir(tmp_path, sf_dir) -> str:
    """A documents table whose RAW text is genuinely multilingual: the
    sf0.001 corpus translated per its lang label (what the derived corpus
    looks like, materialized), other tables symlinked."""
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, lang, text, source FROM read_parquet('{sf_dir}/documents.parquet')"
    ).df()
    texts = []
    for _, r in docs.iterrows():
        table = TRANSLATIONS.get(r["lang"], {})
        toks = re.findall(r"[a-z0-9]+", r["text"].lower())
        texts.append(" ".join(table.get(t, t) for t in toks))
    tbl = pa.table(
        {
            "doc_id": pa.array(docs["doc_id"], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(docs["lang"], pa.string()),
            "source": pa.array(docs["source"], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path / "multilingual"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{sf_dir}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


def test_clf_beats_marker_heuristic_on_multilingual_text(spark, tmp_path, sf_dir):
    """The differential that justifies the upgrade: on raw multilingual text
    the trained classifier is (near-)perfect while the 6-marker heuristic
    confuses languages with shared markers (zh-pinyin 'de' is also an es
    marker, fr 'le' is also a zh marker). NOTE the clf query re-derives
    translations per label, but translated words are outside the fixture
    vocabulary so they pass through the CASE unchanged — the classifier
    genuinely scores the raw text."""
    fixture = _multilingual_fixture_dir(tmp_path, sf_dir)

    clf = REG["doc_language_id_clf"].fn(spark, fixture).collect()
    heur = REG["doc_language_id"].fn(spark, fixture).collect()
    n = len(clf)
    assert n == len(heur) > 0
    clf_acc = sum(r["predicted_lang"] == r["actual_lang"] for r in clf) / n
    heur_acc = sum(r["predicted_lang"] == r["actual_lang"] for r in heur) / n
    assert clf_acc >= 0.99
    assert clf_acc > heur_acc
    # the specific confusion the markers cannot resolve: zh docs carry 'de'
    # (the -> de), which is ALSO an es marker — the heuristic must lose
    # ground exactly there, the classifier must not
    zh_heur = [r for r in heur if r["actual_lang"] == "zh"]
    assert any(r["predicted_lang"] != "zh" for r in zh_heur)
    zh_clf = [r for r in clf if r["actual_lang"] == "zh"]
    assert all(r["predicted_lang"] == "zh" for r in zh_clf)


def test_feature_hash_twin_matches_engines(spark):
    """features_py (the training featurizer) must agree with the engine
    expressions: check the 128-bucket bigram+trigram histogram of one
    string against Spark."""
    from pyspark.sql import functions as F

    from clickhouse_etl_loadtest_spark.functions.hashing import h60
    from clickhouse_etl_loadtest_spark.operators.langid import N_FEATURES

    s = "der schnelle kunde liest die tabelle"
    df = spark.createDataFrame([(s,)], "t string").select(
        F.explode(
            F.expr(
                "concat("
                " transform(sequence(1, length(t) - 1), i -> substring(t, i, 2)),"
                " transform(sequence(1, length(t) - 2), i -> substring(t, i, 3)))"
            )
        ).alias("bg")
    )
    bucket = (h60(F.col("bg")) % N_BUCKETS) + F.when(
        F.length("bg") == 3, N_BUCKETS
    ).otherwise(0)
    rows = df.select(bucket.alias("b")).collect()
    counts = [0] * N_FEATURES
    for r in rows:
        counts[r["b"]] += 1
    n = len(rows)
    assert [c / n for c in counts] == features_py(s)


def _held_out_fixture():
    """Same vocabulary, DIFFERENT derivation than training_fixture(): stride
    (11s + 5k + 1) vs the training (7s + 3k) — none of these 250 sentences
    appears in the training set, so scoring them is a genuine held-out eval
    of the pinned weights, not a memorization check."""
    from clickhouse_etl_loadtest_spark.operators.langid import _VOCAB

    rows = []
    for lang in LANGS:
        t = TRANSLATIONS.get(lang, {})
        for s in range(25):
            words = [
                t.get(_VOCAB[(11 * s + 5 * k + 1) % len(_VOCAB)],
                      _VOCAB[(11 * s + 5 * k + 1) % len(_VOCAB)])
                for k in range(12)
            ]
            rows.append((lang, " ".join(words)))
    return rows


def test_held_out_sentences_confusion_matrix(spark):
    """Held-out accuracy floor for the pinned classifier: 250 sentences the
    training derivation never produced, all ten languages. Asserts ≥ 0.95
    accuracy and prints the confusion matrix on failure (measured 1.00 at
    pinning time — any retrain that drops a language below the floor fails
    here before it ships)."""
    from collections import Counter

    from clickhouse_etl_loadtest_spark.operators.langid import predict_lang_spark

    rows = [(i, lang, text) for i, (lang, text) in enumerate(_held_out_fixture())]
    df = spark.createDataFrame(rows, "pid long, actual string, text string")
    j = df.join(predict_lang_spark(df.select("pid", "text"), "pid", "text"), "pid")
    got = j.collect()
    assert len(got) == 250
    conf = Counter((r["actual"], r["predicted_lang"]) for r in got)
    correct = sum(v for (a, p), v in conf.items() if a == p)
    wrong = {f"{a}->{p}": v for (a, p), v in sorted(conf.items()) if a != p}
    assert correct / len(got) >= 0.95, f"held-out confusion: {wrong}"


def test_mixed_language_docs_resolve_within_the_pair(spark):
    """Near-cognate / code-switched docs (8 words of the majority language +
    4 of a close neighbor: es/pt, de/nl, sv/de, fr/it, it/es). The argmax
    must stay inside the mixture pair ≥ 90% of the time and pick the
    majority ≥ 70% (measured 0.97 / 0.81 at pinning time); the remainder is
    the honest cost of hashed character n-grams on cognates — recorded here
    instead of hidden."""
    from collections import Counter

    from clickhouse_etl_loadtest_spark.operators.langid import (
        _VOCAB,
        predict_lang_spark,
    )

    pairs = [("es", "pt"), ("pt", "es"), ("de", "nl"), ("nl", "de"),
             ("sv", "de"), ("fr", "it"), ("it", "es")]
    rows, pid = [], 0
    for a, b in pairs:
        ta, tb = TRANSLATIONS.get(a, {}), TRANSLATIONS.get(b, {})
        for s in range(10):
            wa = [ta.get(_VOCAB[(13 * s + 2 * k) % len(_VOCAB)],
                         _VOCAB[(13 * s + 2 * k) % len(_VOCAB)]) for k in range(8)]
            wb = [tb.get(_VOCAB[(13 * s + 2 * k + 1) % len(_VOCAB)],
                         _VOCAB[(13 * s + 2 * k + 1) % len(_VOCAB)]) for k in range(4)]
            rows.append((pid, a, b, " ".join(wa + wb)))
            pid += 1
    df = spark.createDataFrame(rows, "pid long, major string, minor string, text string")
    j = df.join(predict_lang_spark(df.select("pid", "text"), "pid", "text"), "pid")
    got = j.collect()
    assert len(got) == len(rows)
    majority = sum(1 for r in got if r["predicted_lang"] == r["major"])
    in_pair = sum(1 for r in got if r["predicted_lang"] in (r["major"], r["minor"]))
    escapes = Counter(
        (r["major"], r["minor"], r["predicted_lang"])
        for r in got
        if r["predicted_lang"] not in (r["major"], r["minor"])
    )
    assert in_pair / len(got) >= 0.90, f"out-of-pair escapes: {dict(escapes)}"
    assert majority / len(got) >= 0.70
