"""Tiny deterministic language-ID heuristic (stopword profiles).

A training-data-pipeline utility (SURVEY round brief): classify each
document by counting hits against per-language stopword profiles — the
classic n-gram/stopword heuristic (cf. Cavnar & Trenkle 1994) in a fully
vectorizable form.  Deterministic ties break by language-code order.
"""

from __future__ import annotations

import numpy as np

PROFILES: dict[str, frozenset] = {
    "de": frozenset("der die das und ist nicht ich ein eine mit von für auf den".split()),
    "en": frozenset("the a of and to in is it that for on with as at this".split()),
    "es": frozenset("el la los las de que y en un una es por con para no".split()),
    "fr": frozenset("le la les de et un une est que pour dans ce il ne pas".split()),
}
_LANGS = sorted(PROFILES)


def predict_lang(texts) -> list[str]:
    """(n,) strings -> predicted language codes ('und' when no hits)."""
    out = []
    for s in texts:
        toks = (s or "").lower().split()
        scores = np.array(
            [sum(1 for t in toks if t in PROFILES[lang]) for lang in _LANGS]
        )
        out.append(_LANGS[int(np.argmax(scores))] if scores.max() > 0 else "und")
    return out
