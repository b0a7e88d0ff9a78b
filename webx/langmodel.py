"""TRAINED hashed-n-gram language-ID model — the fastText-shaped
multinomial companion to the frozen stopword heuristic
(webx/textstats.py lang_id, which stays as the cheap fallback).

The production analog of the reference's trained recognizers
(configs/rec/crnn/README.md:44 — models trained offline, shipped as
weights, applied as pure inference): here a multinomial Naive-Bayes
model over HASHED word uni+bigram features is trained in plain Python
over a frozen synthetic multilingual corpus at import time (the corpus
is data, the training is deterministic arithmetic — no RNG), and the
resulting INTEGER weight tables are applied in Spark as pure codegen:

    score_lang(doc) = Σ_feats  W_lang[ pmod(xxhash64(feat), D) ]

* features are the lowercased whitespace tokens plus adjacent-pair
  bigrams, built once with ``concat_ws`` and hashed once with the JVM
  ``xxhash64`` (the webx/classifier.py shape — no join, no shuffle,
  no Python at scoring time);
* weights are scaled log-likelihoods ``round(S·ln((c+1)/(N+D)))``
  (add-one smoothing), frozen to integers so the per-language fold is
  order-independent and cross-engine EXACT — the DuckDB oracle
  recomputes every score bit-for-bit through the xxh64 SQL port
  (webx/oracles.py) and the same literal weight arrays;
* D must divide 2^64 (power of two) so unsigned ``h % D`` in the
  oracle equals Spark's ``pmod`` on the signed hash.

Because every language scores the SAME feature multiset, the equal-
prior argmax is the standard multinomial NB decision rule; ties break
in LANGS priority order, zero features → 'und' (matching lang_id)."""

from __future__ import annotations

import math
from typing import Dict, List

from pyspark.sql import DataFrame, functions as F

from webx.xxh64 import hash_bytes

LANGS = ("en", "de", "fr", "es")
DIM = 256
SCALE = 1000

# Frozen training corpus: deterministic everyday sentences per language
# (public common vocabulary, synthetic text). This is DATA — edits here
# change the model and must rev the fixtures.
LANG_CORPUS: Dict[str, tuple] = {
    "en": (
        "the quick brown fox jumps over the lazy dog near the river",
        "she said that it was not the right time for a long meeting",
        "we have been working on this project for more than one year",
        "children often play in the park when the weather is warm",
        "please send the report to the office before the end of day",
        "a good book and a cup of tea make the evening much better",
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund am fluss",
        "sie sagte dass es nicht die richtige zeit für ein langes treffen war",
        "wir arbeiten seit mehr als einem jahr an diesem projekt",
        "kinder spielen oft im park wenn das wetter warm ist",
        "bitte senden sie den bericht vor dem ende des tages an das büro",
        "ein gutes buch und eine tasse tee machen den abend viel besser",
    ),
    "fr": (
        "le renard brun rapide saute par dessus le chien paresseux près de la rivière",
        "elle a dit que ce n'était pas le bon moment pour une longue réunion",
        "nous travaillons sur ce projet depuis plus d'un an",
        "les enfants jouent souvent dans le parc quand le temps est chaud",
        "veuillez envoyer le rapport au bureau avant la fin de la journée",
        "un bon livre et une tasse de thé rendent la soirée bien meilleure",
    ),
    "es": (
        "el zorro marrón rápido salta sobre el perro perezoso cerca del río",
        "ella dijo que no era el momento adecuado para una reunión larga",
        "hemos estado trabajando en este proyecto durante más de un año",
        "los niños juegan a menudo en el parque cuando el tiempo es cálido",
        "por favor envíe el informe a la oficina antes del final del día",
        "un buen libro y una taza de té hacen la tarde mucho mejor",
    ),
}

# Held-out test snippets: same vocabulary world, UNSEEN word orders —
# the q_langid_model fixtures (webx/synth-style closed forms).
TEST_SNIPPETS: Dict[str, str] = {
    "en": "the children said the weather near the river was warm and good",
    "de": "die kinder sagten dass das wetter am fluss warm und gut war",
    "fr": "les enfants ont dit que le temps près de la rivière était chaud",
    "es": "los niños dijeron que el tiempo cerca del río era cálido y bueno",
}


def _features(text: str) -> List[str]:
    toks = text.lower().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def train_langid(dim: int = DIM, scale: int = SCALE) -> Dict[str, List[int]]:
    """Multinomial NB training: hashed-feature counts per language →
    integer scaled log-likelihood weights (add-one smoothing). Pure
    deterministic Python; runs once at import over the frozen corpus."""
    if dim & (dim - 1):
        raise ValueError(f"dim must be a power of two, got {dim}")
    out: Dict[str, List[int]] = {}
    for lang in LANGS:
        counts = [0] * dim
        total = 0
        for sent in LANG_CORPUS[lang]:
            for feat in _features(sent):
                counts[hash_bytes(feat.encode("utf-8")) % dim] += 1
                total += 1
        out[lang] = [
            round(scale * math.log((c + 1) / (total + dim))) for c in counts
        ]
    return out


FROZEN_WEIGHTS: Dict[str, List[int]] = train_langid()


def langid_model(
    docs: DataFrame,
    weights: "Dict[str, List[int]] | None" = None,
    col: str = "text",
) -> DataFrame:
    """(doc_id, s_en, s_de, s_fr, s_es, pred_lang): integer NB scores
    per language + argmax prediction. Pure column expressions — the
    whole model fuses into the scan stage (no shuffle, no Python)."""
    weights = weights or FROZEN_WEIGHTS
    dim = len(next(iter(weights.values())))
    toks = F.transform(
        F.split(F.trim(F.coalesce(F.col(col), F.lit(""))), "[ \\t\\r\\n]+"),
        lambda w: F.lower(w),
    )
    n = F.size(toks)
    bi = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.when(
        F.length(F.trim(F.coalesce(F.col(col), F.lit("")))) > 0,
        F.concat(toks, bi),
    ).otherwise(F.array().cast("array<string>"))
    # Higher-order functions are interpreted (no whole-stage codegen), so
    # the scoring pass is shaped to touch each feature ONCE: hash every
    # feature to its bucket in one transform, then ONE aggregate whose
    # accumulator is a 4-field struct summing all languages together
    # (4 separate folds re-evaluated the feature build + hash per
    # language — measured ~4x slower). Weight tables are TRUE array
    # literals (F.lit(list)), not CreateArray — element_at over
    # CreateArray re-evaluates the 256-element construction per access.
    langs = list(weights.keys())
    w_arrs = [F.lit([int(v) for v in weights[lang]]).cast("array<long>")
              for lang in langs]
    buckets = F.transform(
        feats, lambda g: F.pmod(F.xxhash64(g), F.lit(dim)).cast("int") + 1
    )
    zero = F.struct(
        *[F.lit(0).cast("long").alias(f"c{i}") for i in range(len(langs))]
    )
    acc_struct = F.aggregate(
        buckets,
        zero,
        lambda acc, b: F.struct(
            *[
                (acc[f"c{i}"] + F.element_at(w_arrs[i], b)).alias(f"c{i}")
                for i in range(len(langs))
            ]
        ),
    )
    # materialize the struct ONCE through a projection boundary — four
    # direct uses of the aggregate expression would recompute the fold
    staged = docs.select("doc_id", F.size(feats).alias("__nf"),
                         acc_struct.alias("__s"))
    scores = {lang: F.col("__s").getField(f"c{i}")
              for i, lang in enumerate(langs)}
    best = F.greatest(*scores.values())
    pred = F.when(F.col("__nf") == 0, F.lit("und"))
    for lang in langs:  # priority order on ties
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return staged.select(
        "doc_id",
        *[scores[lang].alias(f"s_{lang}") for lang in langs],
        pred.alias("pred_lang"),
    )
