"""Deterministic synthetic transcript corpus (the engine's primary input).

Generates the Parquet tables of FIXTURES.md on demand, seeded and
wall-clock-free, so any two runs — and any two parallelism levels —
produce identical bytes:

* ``transcripts``   (conv_id:string, turn_idx:int32, role:string,
                     text:string, tool:string, ts:timestamp[us])
  — exactly BASELINE.json ``input_hint``; Zipf-skewed turn counts and
  tool usage provide the hot keys the salting stages must handle.
* ``entities``      (entity_id, name, aliases:list<string>) — the KB,
  analog of the reference's entities.txt
  (/root/reference/utils_e2e_span.py:26-32).
* ``gold_mentions`` (mention_id, conv_id, turn_idx, start, end, surface,
  entity_id) — planted spans, analog of mentions.json records
  (/root/reference/data_preprocessing.py:74-81).  Invariant: for every
  row, ``text[start:end] == surface`` (the reference asserts the same at
  /root/reference/utils_e2e_span.py:96).

Aliases are *string-similar* variants of the canonical name (typos,
prefix truncations, hyphenation, casing) so that shingle-MinHash blocking
and Jaro-Winkler scoring can recover the entity clusters — the classic
record-linkage corpus shape (cf. Febrl / Christen 2012).

Corpora are cached under ``/tmp/bel_ray_corpus/<tag>``; generation is
atomic (tmpdir + rename) so concurrent callers are safe.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

GEN_VERSION = "v1"
DEFAULT_ROOT = "/tmp/bel_ray_corpus"
BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z, fixed epoch — never wall clock

ROLES = ("user", "assistant", "tool")
TOOL_NAMES = (
    "search", "browser", "python", "bash", "calculator", "sql",
    "retrieval", "editor", "planner", "mailer", "scheduler", "none_tool",
)

_SYL_A = ("card", "neuro", "hepat", "derm", "osteo", "gastr", "pulmo", "nephr",
          "angio", "cyto", "thromb", "lipo", "myo", "arthr", "broncho", "hemo")
_SYL_B = ("axi", "olo", "ari", "ecta", "ino", "ova", "uri", "ema",
          "ala", "opo", "iri", "ygo")
_SYL_C = ("zine", "mab", "prine", "statin", "cillin", "oxib", "azole", "idone",
          "amine", "erol", "axel", "itide")

_FILLER_WORDS = (
    "the patient reported that after taking the medication the symptoms",
    "we observed a marked response in the trial cohort following",
    "please check the dosage guidance before administering",
    "the assistant retrieved records indicating prior exposure to",
    "laboratory results confirmed elevated markers consistent with",
    "the clinician noted an adverse interaction between the compound and",
    "follow up imaging showed no progression related to",
    "treatment was discontinued due to side effects from",
    "the tool call returned three documents mentioning",
    "summary of the conversation so far includes discussion of",
    "a second opinion was requested regarding the diagnosis of",
    "the user asked whether it is safe to combine",
)


@dataclass(frozen=True)
class CorpusSpec:
    """Scale + seed of one synthetic corpus."""

    n_convs: int
    seed: int = 42

    @property
    def tag(self) -> str:
        return f"c{self.n_convs}_s{self.seed}_{GEN_VERSION}"

    @property
    def n_entities(self) -> int:
        return max(40, self.n_convs // 3)


def spec_for_sf_dir(sf_dir: str, seed: int = 42) -> CorpusSpec:
    """Map a driver testdata dir (…/sf0.01) to a corpus scale.

    sf0.001 -> 200 convs (~2k turns, t1 smoke); sf0.01 -> 2k convs
    (~20k turns, t2 correctness); sf0.1 -> 20k convs (~200k turns, bench).
    Mirrors FIXTURES.md §6 scale points.
    """
    name = os.path.basename(os.path.normpath(sf_dir))
    sf = float(name.replace("sf", "")) if name.startswith("sf") else 0.001
    return CorpusSpec(n_convs=max(20, int(round(sf * 200_000))), seed=seed)


# ---------------------------------------------------------------------------
# generation internals (pure numpy; all randomness from one seeded Generator)
# ---------------------------------------------------------------------------

def _make_entities(spec: CorpusSpec, rng: np.random.Generator):
    """KB with string-similar alias variants per entity."""
    n = spec.n_entities
    combos = len(_SYL_A) * len(_SYL_B) * len(_SYL_C)
    # two stems per entity name, unique (i, j) pairs without replacement
    idx = rng.choice(combos * combos, size=n, replace=False)
    names, alias_lists = [], []
    for eid in range(n):
        i, j = divmod(int(idx[eid]), combos)
        def stem(k: int) -> str:
            a, rem = divmod(k, len(_SYL_B) * len(_SYL_C))
            b, c = divmod(rem, len(_SYL_C))
            return _SYL_A[a] + _SYL_B[b] + _SYL_C[c]
        w1, w2 = stem(i), stem(j)
        name = f"{w1} {w2}"
        aliases = [name]
        # typo: swap two adjacent chars of w1 (deterministic position)
        p = 1 + int(rng.integers(0, len(w1) - 2))
        aliases.append(w1[:p] + w1[p + 1] + w1[p] + w1[p + 2:] + " " + w2)
        # prefix truncation ("acetamin" style) — keeps Jaro-Winkler high
        aliases.append(w1[: max(5, len(w1) - 3)] + " " + w2[: max(4, len(w2) - 4)])
        # hyphenation variant
        aliases.append(f"{w1}-{w2}")
        # char-drop typo in w2
        q = 1 + int(rng.integers(0, len(w2) - 2))
        aliases.append(f"{w1} {w2[:q] + w2[q + 1:]}")
        names.append(name)
        alias_lists.append(aliases)
    entity_ids = [f"E{eid:06d}" for eid in range(n)]
    return entity_ids, names, alias_lists


def generate_corpus(out_dir: str | Path, spec: CorpusSpec) -> None:
    """Write transcripts/entities/gold_mentions parquet into ``out_dir``."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(np.random.PCG64(spec.seed))

    entity_ids, names, alias_lists = _make_entities(spec, rng)
    n_ent = len(entity_ids)

    ent_table = pa.table(
        {
            "entity_id": pa.array(entity_ids, pa.string()),
            "name": pa.array(names, pa.string()),
            "aliases": pa.array(alias_lists, pa.list_(pa.string())),
        }
    )
    pq.write_table(ent_table, out / "entities.parquet")

    # ---- per-conversation turn counts: Zipf-skewed, capped -----------------
    n_convs = spec.n_convs
    turn_counts = np.minimum(3 + rng.zipf(1.6, size=n_convs), 60).astype(np.int64)
    total_turns = int(turn_counts.sum())
    conv_ord = np.repeat(np.arange(n_convs), turn_counts)
    turn_idx = np.concatenate([np.arange(c) for c in turn_counts]).astype(np.int32)

    # roles cycle user/assistant/tool-ish; tools Zipf-skewed (hot-key axis 2)
    role_code = (turn_idx % 3).astype(np.int64)
    tool_draw = np.minimum(rng.zipf(1.7, size=total_turns) - 1, len(TOOL_NAMES) - 1)

    # timestamps: conv base + cumulative in-conv increments (deterministic)
    incr = rng.integers(5_000_000, 90_000_000, size=total_turns, dtype=np.int64)
    ts = BASE_TS_US + conv_ord * 3_600_000_000 + np.concatenate(
        [np.cumsum(incr[s : s + c]) for s, c in zip(np.cumsum(turn_counts) - turn_counts, turn_counts)]
    )

    # ---- mentions per turn: 0..3, entities Zipf-skewed (hot clusters) ------
    n_mentions_per_turn = rng.choice(4, size=total_turns, p=[0.30, 0.38, 0.22, 0.10])
    total_mentions = int(n_mentions_per_turn.sum())
    ent_pick = np.minimum(rng.zipf(1.4, size=total_mentions) - 1, n_ent - 1)
    # permute so the hot entity isn't always E000000
    perm = rng.permutation(n_ent)
    ent_pick = perm[ent_pick]
    alias_pick = rng.integers(0, 5, size=total_mentions)
    filler_pick = rng.integers(0, len(_FILLER_WORDS), size=total_turns * 4).reshape(total_turns, 4)
    upper_mask = rng.random(total_turns) < 0.08      # casing noise
    dblspace_mask = rng.random(total_turns) < 0.05   # whitespace noise

    # ---- assemble texts + gold offsets (python loop; one-time, cached) -----
    texts: list[str] = []
    g_mid: list[str] = []
    g_conv: list[np.int64] = []
    g_turn: list[int] = []
    g_start: list[int] = []
    g_end: list[int] = []
    g_surface: list[str] = []
    g_entity: list[str] = []

    mcursor = 0
    fillers = _FILLER_WORDS
    for t in range(total_turns):
        k = int(n_mentions_per_turn[t])
        parts: list[str] = []
        pos = 0
        for m in range(k + 1):
            frag = fillers[filler_pick[t, m]]
            if upper_mask[t] and m == 0:
                frag = frag.upper()
            parts.append(frag)
            pos += len(frag)
            if m < k:
                sep = "  " if dblspace_mask[t] and m == 0 else " "
                parts.append(sep)
                pos += len(sep)
                e = int(ent_pick[mcursor])
                surface = alias_lists[e][int(alias_pick[mcursor])]
                parts.append(surface)
                g_mid.append(f"c{conv_ord[t]:07d}_{turn_idx[t]}_{m}")
                g_conv.append(conv_ord[t])
                g_turn.append(int(turn_idx[t]))
                g_start.append(pos)
                g_end.append(pos + len(surface))
                g_surface.append(surface)
                g_entity.append(entity_ids[e])
                pos += len(surface)
                parts.append(" ")
                pos += 1
                mcursor += 1
        texts.append("".join(parts))

    conv_ids = np.char.add("conv-", np.char.zfill(conv_ord.astype("U7"), 7))
    roles = np.array(ROLES)[role_code]
    tools = np.where(role_code == 2, np.array(TOOL_NAMES)[tool_draw], "")

    transcripts = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    pq.write_table(transcripts, out / "transcripts.parquet", row_group_size=64 * 1024)

    gold = pa.table(
        {
            "mention_id": pa.array(g_mid, pa.string()),
            "conv_id": pa.array(
                np.char.add("conv-", np.char.zfill(np.asarray(g_conv).astype("U7"), 7)),
                pa.string(),
            ),
            "turn_idx": pa.array(g_turn, pa.int32()),
            "start": pa.array(g_start, pa.int32()),
            "end": pa.array(g_end, pa.int32()),
            "surface": pa.array(g_surface, pa.string()),
            "entity_id": pa.array(g_entity, pa.string()),
        }
    )
    pq.write_table(gold, out / "gold_mentions.parquet", row_group_size=64 * 1024)


def ensure_corpus(spec: CorpusSpec, root: str | Path = DEFAULT_ROOT) -> Path:
    """Generate-if-missing, atomically; returns the corpus directory."""
    root = Path(root)
    final = root / spec.tag
    if (final / "_COMPLETE").exists():
        return final
    root.mkdir(parents=True, exist_ok=True)
    tmp = root / f".{spec.tag}.tmp{os.getpid()}"
    if tmp.exists():
        shutil.rmtree(tmp)
    generate_corpus(tmp, spec)
    (tmp / "_COMPLETE").write_text(spec.tag)
    try:
        os.rename(tmp, final)
    except OSError:
        # lost the race to a concurrent generator — its output is identical
        shutil.rmtree(tmp, ignore_errors=True)
    return final


def ensure_corpus_for_sf_dir(sf_dir: str, seed: int = 42) -> Path:
    return ensure_corpus(spec_for_sf_dir(sf_dir, seed))
