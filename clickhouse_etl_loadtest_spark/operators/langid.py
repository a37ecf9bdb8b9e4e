"""Trained language identification: hashed char-bigram features through the
DECIMAL-summed logistic machinery (``operators/logreg.py``) — the upgrade
path from the marker-word heuristic (``queries/text.py::doc_language_id``,
kept as the documented cheap tier).

Public recipe: fastText-style langid (Joulin et al. 2016 — character n-gram
bags into a linear classifier) shrunk to the fixture's five languages and a
64-bucket hashed feature space.

Design for cross-engine exactness (the same discipline as
``doc_unigram_logprob``):

- The corpus fixture's ``text`` is language-INDEPENDENT (one shared synthetic
  vocabulary); the ``lang`` column is the label. The multilingual corpus is
  therefore DERIVED: each document's tokens are mapped through a fixed
  per-language translation table (:data:`TRANSLATIONS`), identically in Spark
  and in the DuckDB oracle, so the derived text genuinely reflects its label.
- Features: char bigrams (spaces included — word boundaries carry signal) of
  the derived text, hashed ``h60(bigram) % 64`` into buckets; feature value
  = bucket count / total bigrams. Linear score folds as
  ``w0 + (Σ_b count_b · w_b) / n`` with the Σ accumulated in DECIMAL(38,18)
  — exact and order-independent, so both engines produce bit-identical
  scores and the argmax can never drift at a float boundary.
- Training runs on a FIXED, scale-independent fixture
  (:func:`training_fixture` — deterministic sentences over each language's
  translated vocabulary), one-vs-rest :func:`~.logreg.logistic_fit` per
  language. Because the fixture is constant, the weights are constants:
  :data:`LANGID_WEIGHTS` below is the canonical copy both engines score
  with, and ``tests/test_langid.py`` RE-TRAINS and asserts the constants
  match (the pin that keeps them honest). Regenerate with
  ``python scripts/train_langid.py``.

At 100 TB: scoring is one explode + one (doc_id, lang, bucket) count shuffle
+ one doc-keyed rollup — short keys only, no text across exchanges, no
Python anywhere; the model is 5 × 65 literals folded into the plan.
"""

from __future__ import annotations

import hashlib

from ..functions.hashing import h60_sql_duckdb

N_BUCKETS = 64
LANGS = ("de", "en", "es", "fr", "zh")

# Fixed per-language renderings of the fixture vocabulary (ASCII only — the
# zh column is pinyin). Unmapped tokens pass through unchanged in every
# engine. 'en' is the identity.
TRANSLATIONS: dict[str, dict[str, str]] = {
    "de": {
        "a": "ein", "agg": "aggregat", "batch": "stapel", "big": "gross",
        "column": "spalte", "customer": "kunde", "data": "daten",
        "dup": "duplikat", "fast": "schnell", "filter": "filter",
        "group": "gruppe", "hash": "hasch", "join": "verbindung",
        "key": "schluessel", "line": "zeile", "merge": "zusammenfuehren",
        "order": "reihenfolge", "part": "teil", "query": "abfrage",
        "row": "reihe", "scan": "abtastung", "slow": "langsam",
        "small": "klein", "sort": "sortierung", "spark": "funke",
        "stream": "strom", "table": "tabelle", "the": "der",
        "value": "wert", "vector": "vektor", "window": "fenster",
    },
    "es": {
        "a": "un", "agg": "agregado", "batch": "lote", "big": "grande",
        "column": "columna", "customer": "cliente", "data": "datos",
        "dup": "duplicado", "fast": "rapido", "filter": "filtro",
        "group": "grupo", "hash": "hash", "join": "union",
        "key": "clave", "line": "linea", "merge": "fusionar",
        "order": "orden", "part": "parte", "query": "consulta",
        "row": "fila", "scan": "escaneo", "slow": "lento",
        "small": "pequeno", "sort": "ordenar", "spark": "chispa",
        "stream": "flujo", "table": "tabla", "the": "el",
        "value": "valor", "vector": "vector", "window": "ventana",
    },
    "fr": {
        "a": "un", "agg": "agregat", "batch": "lot", "big": "grand",
        "column": "colonne", "customer": "client", "data": "donnees",
        "dup": "doublon", "fast": "rapide", "filter": "filtre",
        "group": "groupe", "hash": "hachage", "join": "jointure",
        "key": "cle", "line": "ligne", "merge": "fusionner",
        "order": "ordre", "part": "partie", "query": "requete",
        "row": "rangee", "scan": "balayage", "slow": "lent",
        "small": "petit", "sort": "tri", "spark": "etincelle",
        "stream": "flux", "table": "table", "the": "le",
        "value": "valeur", "vector": "vecteur", "window": "fenetre",
    },
    "zh": {
        "a": "yi", "agg": "juhe", "batch": "piliang", "big": "da",
        "column": "lie", "customer": "kehu", "data": "shuju",
        "dup": "chongfu", "fast": "kuai", "filter": "guolv",
        "group": "zu", "hash": "sanlie", "join": "lianjie",
        "key": "jian", "line": "hang", "merge": "hebing",
        "order": "shunxu", "part": "bufen", "query": "chaxun",
        "row": "xing", "scan": "saomiao", "slow": "man",
        "small": "xiao", "sort": "paixu", "spark": "huohua",
        "stream": "liu", "table": "biao", "the": "de",
        "value": "zhi", "vector": "xiangliang", "window": "chuangkou",
    },
}

_VOCAB = sorted(TRANSLATIONS["de"])  # the shared fixture vocabulary


def translate_case_sql(lang_expr: str, word_var: str) -> str:
    """The shared (Spark SQL ≡ DuckDB SQL) token-translation CASE: maps one
    token ``word_var`` according to ``lang_expr``; unmapped tokens and 'en'
    pass through."""
    branches = []
    for lang in ("de", "es", "fr", "zh"):
        inner = " ".join(
            f"WHEN '{w}' THEN '{TRANSLATIONS[lang][w]}'" for w in _VOCAB
        )
        branches.append(
            f"WHEN {lang_expr} = '{lang}' THEN (CASE {word_var} {inner} ELSE {word_var} END)"
        )
    return "CASE " + " ".join(branches) + f" ELSE {word_var} END"


def h60_py(s: str) -> int:
    """Python twin of functions/hashing.h60 (first 15 md5 hex digits)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def bigram_buckets_py(text: str) -> list[int]:
    """Hashed bigram buckets of a derived text — the Python twin of the
    Spark/DuckDB expressions, used to featurize the training fixture (and by
    the pin test to cross-check the engine pipelines)."""
    return [
        h60_py(text[i : i + 2]) % N_BUCKETS for i in range(len(text) - 1)
    ]


def features_py(text: str) -> list[float]:
    """64 normalized bucket counts; float division = IEEE double, identical
    to the engines' count/total."""
    buckets = bigram_buckets_py(text)
    n = len(buckets)
    counts = [0] * N_BUCKETS
    for b in buckets:
        counts[b] += 1
    return [c / n if n else 0.0 for c in counts]


def training_fixture() -> list[tuple[str, str]]:
    """The fixed multilingual training set: for each language, 25
    deterministic 12-word sentences over its translated vocabulary (modular
    stride — no RNG, no wall-clock; byte-identical everywhere)."""
    rows = []
    for lang in LANGS:
        table = TRANSLATIONS.get(lang, {})
        for s in range(25):
            words = [
                table.get(_VOCAB[(7 * s + 3 * k) % len(_VOCAB)], _VOCAB[(7 * s + 3 * k) % len(_VOCAB)])
                for k in range(12)
            ]
            rows.append((lang, " ".join(words)))
    return rows


def train_langid_weights(spark, iterations: int = 30, lr: float = 2.0) -> dict[str, list[float]]:
    """One-vs-rest logistic fit per language on :func:`training_fixture`,
    through :func:`operators.logreg.logistic_fit` (DECIMAL-summed gradients —
    deterministic given the fixed fixture). Returns {lang: [bias, w1..w64]}."""
    from .logreg import logistic_fit_multi

    fixture = training_fixture()
    feat_cols = [f"f{j}" for j in range(N_BUCKETS)]
    rows = [(lang, *features_py(text)) for lang, text in fixture]
    schema = "lang string, " + ", ".join(f"{c} double" for c in feat_cols)
    df = spark.createDataFrame(rows, schema)
    return logistic_fit_multi(
        df, feat_cols, "lang", list(LANGS), iterations=iterations, lr=lr
    )


# Canonical trained weights — regenerate with `python scripts/train_langid.py`
# (deterministic: re-training reproduces these exactly; pinned by
# tests/test_langid.py::test_weights_pin_retrain_reproduces_constants).
LANGID_WEIGHTS: dict[str, list[float]] = {
    "de": [-1.3692066400165501, -0.031867255670085554, -0.014514172658620244, -0.002542148840899757, 0.0689985496743778, -0.11254743842974305, -0.06786158897860083, -0.010895842369325585, 0.04286685394254022, 0.041908146113935535, -0.01319385052991586, -0.0754331354738276, -0.09028136726667119, 0.08441204213078761, -0.12268024442730055, -0.00354994283921041, -0.011335942931942962, 0.013740264724189195, 0.14153445951509547, 0.004011319989522199, 0.05513106517351353, 0.06007515997109679, 0.062285621581115815, -0.034181301351313184, -0.13377279659337635, 0.0014116111980197032, -0.06163356078460959, -0.044190441280513124, 0.01716603463107437, 0.05147761080085335, 0.0, -0.12261694158379292, 0.05018022304616061, 0.0, 0.23400453695284776, -0.05109761792381734, -0.14633428939481727, -0.14086251433420666, -0.07404567379777481, -0.13160915101523213, -0.049608861413590014, 0.0023856049657217833, -0.19652837551589653, 0.24713766691873007, 0.0, 0.1148339403111905, -0.21114982278332461, 0.0852428886825318, -0.12625632693658156, -0.02808849482821782, -0.1175775873888129, 0.07740505513516184, -0.14062162345363904, -0.09728724385553136, -0.09455539065431162, 0.011887432161470502, -0.12166752535969619, 0.029652114839608133, -0.030767500145051203, 0.25919848674731666, -0.07648461747916427, -0.055787856861904905, -0.18968087621451601, -0.04683301903885636, -0.046210988818719524],
    "en": [-1.351106057756796, -0.19243977409683843, -0.13558554078736193, 0.0241191004822838, 0.08099176885320715, 0.15061681266555574, -0.0780114150029047, -0.030664916020206226, -0.16828808171431647, 0.14036506668903392, -0.03577971248917447, -0.15897941925801293, -0.1370560790834567, -0.06593549975693012, 0.17691418714366072, 0.03705011295442635, 0.023686547083790116, 0.029878504785279803, 0.05821510549182935, -0.09313341325792843, -0.027522503523397086, -0.024521721657673357, -0.1464908916080237, -0.08269711573498251, -0.2213106777949327, -0.003292401127946949, 0.024981467609589147, -0.008701761956722795, 0.06671276237313963, -0.033182480997252205, 0.0, -0.02692103453202202, -0.11576572645467324, 0.0, 0.10890467787166871, -0.01553646776759734, 0.0020499022005423246, -0.19531521995564666, -0.05628640927080865, 0.05155562931342985, 0.042865746527163615, 0.057823492827663525, -0.007412980536657006, -0.24989942473603433, 0.0, -0.03309510792954372, -0.013439581741842755, 0.22947061481500633, -0.1089460046850278, -0.21333587747586727, 0.025526129454264957, 0.16566062338243817, -0.17241950428522354, -0.015836623661399107, -0.02896778643406411, -0.04775264558872505, 0.018593842174485543, 0.03662207343941626, 0.10637474781706313, -0.04918264960575513, -0.08421675632469973, -0.04677910775149102, -0.06238250497515528, 0.19586823659492186, -0.01886839072636003],
    "es": [-1.3470567385875778, -0.12303908694880658, 0.2629583149118727, 0.009067688519144473, 0.04571698585088668, 0.03044163066299737, -0.015299833648811136, -0.10318033444272283, -0.32090223282115454, -0.02081709342062777, -0.04394193180858111, -0.035890694700351056, -0.036769442571228786, 0.02647588163429703, -0.07307983216812086, 0.013056358858674948, -0.012749463954997632, -0.04082177532288952, -0.01794131021625599, 0.14215489227311234, -0.1666664796044891, 0.03579823197060467, 0.016600401052089687, -0.0825424178176422, -0.020092464915746563, -0.18998760494985506, 0.03749997583186917, 0.031218944567272987, 0.05615073723336308, 0.07085133658476864, 0.0, 0.05975122922408705, 0.010199591031723179, 0.0, -0.08863513785423412, -0.09973995394152886, 0.22998319017910443, -0.21678262736628093, -0.052990043701902606, -0.008011234547598675, 0.06197789849055441, -0.03376059934695249, -0.01633879609137021, -0.3573210935803868, 0.0, -0.03276555852010569, 0.33832917700817317, -0.2205225876604227, 0.06551816695401778, -0.08602123555959826, -0.11176804593878199, -0.17318557858071645, -0.01763073790211511, 0.08086220444353884, -0.009750545594254019, -0.08106362481974529, 0.10272839134089698, 0.0747641577993155, -0.030611192159513592, -0.13999025317679648, 0.19034402497279723, -0.042020990333805464, 0.17418827664543207, -0.1994659315814165, -0.19159665905836537],
    "fr": [-1.371472029770533, -0.12808613066874605, -0.11871319183189988, -0.06085065629326504, -0.1860452363559459, 0.03156106763093696, 0.19813055821289974, 0.01461692403854306, 0.015889391564908078, -0.12024974535899663, 0.06345761389470214, 0.24994253174337103, 0.008446614211324989, -0.09465642362465077, -0.07083666051820803, -0.049889123275551756, 0.04254669181380256, -0.04077913700720626, -0.1479302811041829, -0.03565050331224417, -0.16730923021549327, -0.02809334229252872, -0.036916650625258084, -0.02993312491897802, -0.17493826328852127, 0.20657206094444536, -0.0006824848551694717, 0.01574234343747192, -0.03986628976668645, -0.044749230798741206, 0.0, 0.0009267835351486988, -0.06407908673915266, 0.0, -0.16461354885188761, -0.14741079304819452, -0.14614153411969613, -0.10095069410917244, -0.00979149581627115, -0.007547715280057526, -0.014748923172845887, -0.09686496698412321, -0.07476682408306481, 0.21145607460429916, 0.0, -0.033129420296404546, -0.1392532519403817, 0.012459675165959812, 0.11117847119588438, 0.2507118865073391, -0.1128055816626579, -0.19534914568460626, -0.06897225780572351, 0.07898177568921196, -0.01812656952482245, 0.01451002050068967, -0.01512854217031927, -0.05563557305967595, -0.03051525048197152, -0.185382417362673, -0.16466175748592748, 0.2747890832021066, 0.05411965914498011, 0.08161983766029594, 0.11291996132304923],
    "zh": [-1.354660265428329, 0.3761475275496447, -0.13886655262729936, -0.029516983709603307, -0.10480061513434964, -0.2066847031535253, -0.1997291240051856, 0.04519468733758208, 0.2660334924451335, -0.22477676443680125, -0.02071520483340908, -0.10077952615516352, 0.15148654098586414, -0.05416063471379706, -0.0013230285875902785, -0.049561290995130604, -0.14286611372021227, 0.017143646237001126, -0.1393927707613619, -0.0982697610052277, 0.2205930926510282, -0.08902347031711923, 0.029744717800482257, 0.1866270731790027, 0.3697365930662659, -0.1764809914249573, -0.061662009654064646, -0.07119526335956795, -0.20670669418129728, -0.09162462119837786, 0.0, 0.001683346316772442, 0.021703770837557836, 0.0, -0.24657094344221053, 0.23785361822490503, -0.01485318812879156, 0.45217641610963605, 0.13005150087202955, -0.02665413980047137, -0.1647500941676581, -0.010259486381442435, 0.1670491363953049, -0.1905257745185678, 0.0, -0.0325739848161263, -0.1375304324555746, -0.21931879407420504, -0.0364021906389829, -0.06243822278296144, 0.23098263470449332, 0.0012985147365752766, 0.27637654128754885, -0.09643799221474217, 0.028199511427713618, 0.0010426313234105302, -0.04693468627506153, -0.17601606114856158, -0.03017472524829062, -0.09585510386450291, -0.08680616553310543, -0.2674963886695805, -0.1524024153489083, -0.2224728865673331, -0.04117545886516205],
}
