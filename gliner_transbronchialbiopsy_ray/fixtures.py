"""Deterministic synthetic BTB corpus generator (FIXTURES.md §1-§5).

Seed-deterministic (per-doc RNG derived from (seed, doc index) — output is
identical regardless of generation order), no wall-clock dependence.  Emits:

- documents:      (doc_id, spans) interleaved text+media (input_hint shape)
- gold_entities:  planted mentions (doc_id, label, text, start, end) with
                  offsets into the post-normalization biopsy section
- gold_triples:   expected canonical (subj, pred, obj)
- dictionary:     the linking dictionary (lexicon.dictionary_table)
- corrections:    event-sourced human-feedback rows (LWW fold test input)

Documents follow the reference's section structure (header noise ->
CONCLUSION -> 'I- Biopsies transbronchiques (SITE) : N fragments ...' ->
'II- Lavage broncho-alvéolaire'), with glued/dashed/lowercase grade forms to
exercise the grade reformatter, near-miss site spellings to exercise the
similarity-linking fallback, and a power-law length distribution (long
header padding) to exercise repartitioning.  Noise vocabulary is verified
disjoint from the lexicon (tests/test_fixtures.py) so planted gold ==
exactly what a faithful pipeline must extract (P/R gate is meaningful).
"""

from __future__ import annotations

import datetime as _dt
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from .config import label_to_pred
from .lexicon import CONCEPTS, NEAR_MISS_ALIASES, dictionary_table
from .schema import (
    CORRECTIONS_SCHEMA,
    DOCUMENTS_SCHEMA,
    GOLD_ENTITIES_SCHEMA,
    GOLD_TRIPLES_SCHEMA,
)
from .stages.normalize import extract_conclusion

_BY_LABEL: dict[str, list[tuple[str, str, list[str]]]] = {}
for _cid, _cform, _label, _aliases in CONCEPTS:
    _BY_LABEL.setdefault(_label, []).append((_cid, _cform, _aliases))

# Noise vocabulary — MUST stay disjoint from every lexicon alias token.
_NOISE_WORDS = (
    "le patient examen microscopique du parenchyme pulmonaire montre un "
    "aspect habituel sans particularité notable architecture conservée "
    "plèvre viscérale fine bronches de calibre normal vaisseaux réguliers "
    "cellularité modérée prélèvement technique coloration standard selon "
    "protocole service laboratoire référence dossier clinique antécédents"
).split()

_HEADER = "Hôpital Service d'anatomopathologie.\nExamen numéro interne.\n"


def _noise(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_NOISE_WORDS) for _ in range(n_words))


def _grade_sentence(rng: random.Random):
    """Return (sentence, [(label, post-format surface, canonical)])."""
    a = rng.choice(["0", "1", "2", "3", "x"])
    b = rng.choice(["0", "1", "2", "x"])
    ga, gb = f"A{a}", f"B{b}"
    form = rng.randrange(4)
    if form == 0:  # glued: A0B0 -> 'A0 B0'
        frag = f"{ga}{gb}"
    elif form == 1:  # dashed: A1-B0 -> 'A1 B0'
        frag = f"{ga}-{gb}"
    elif form == 2:  # already spaced
        frag = f"{ga} {gb}"
    else:  # 'grade A2' -> 'Grade A2' (grade A only)
        sent = f"Rejet aigu de grade {ga}."
        return sent, [("Grade A", ga, ga.capitalize() if a != "x" else "Ax")]
    sent = f"Absence de rejet aigu significatif : {frag}."
    canon_a = "Ax" if a == "x" else ga
    canon_b = "Bx" if b == "x" else gb
    return sent, [("Grade A", ga, canon_a), ("Grade B", gb, canon_b)]


def _concept_sentence(rng: random.Random, label: str, template: str):
    cid, cform, aliases = rng.choice(_BY_LABEL[label])
    alias = rng.choice(aliases)
    return template.format(alias), [(label, alias, cform)]


_OPTIONAL_LABELS: list[tuple[str, str, float]] = [
    ("Rejet Chronique", "Signes évocateurs de {}.", 0.25),
    ("Coloration C4d", "Immunomarquage : {}.", 0.5),
    ("Lésion Septale", "On note des {}.", 0.3),
    ("Lésion Intra-Alvéolaire", "Présence de {}.", 0.3),
    ("Éosinophilie", "Il existe une {}.", 0.2),
    ("Pneumonie Organisée", "Foyers de {}.", 0.2),
    ("DAD", "Tableau de {}.", 0.15),
    ("Infection", "Recherche positive : {}.", 0.2),
    ("Autre Pathologie", "Par ailleurs : {}.", 0.2),
]


def _gen_doc(seed: int, i: int):
    """Generate one document.  Returns (doc_row, gold list, status)."""
    rng = random.Random(seed * 1_000_003 + i)
    doc_id = f"btb-{i:06d}"
    kind_draw = rng.random()

    gold: list[tuple[str, str, str]] = []  # (label, surface, canonical)

    if kind_draw < 0.02:  # all-media doc -> status no_text
        spans = [
            {"kind": rng.choice(["image", "table"]), "text": "",
             "media_ref": f"media://{doc_id}/m{j}", "offset": j}
            for j in range(rng.randint(1, 3))
        ]
        return {"doc_id": doc_id, "spans": spans}, gold, "no_text"

    # header with power-law length skew
    u = rng.random()
    pad_words = min(int(8 / max(u, 1e-3) ** 0.85), 4000)
    header = _HEADER + _noise(rng, pad_words) + "\n"

    if kind_draw < 0.06:  # no CONCLUSION marker -> no_conclusion
        body = header + _noise(rng, 30)
        return _interleave(rng, doc_id, body), gold, "no_conclusion"

    site_cid, site_cform, site_aliases = rng.choice(_BY_LABEL["Site"])
    site_surface = rng.choice(site_aliases)
    site_canonical = site_cform
    if rng.random() < 0.08:  # near-miss spelling -> similarity-link path
        nm = rng.choice(sorted(NEAR_MISS_ALIASES))
        nm_label, nm_cid = NEAR_MISS_ALIASES[nm]
        if nm_label == "Site":
            site_surface = nm
            site_canonical = next(c[1] for c in CONCEPTS if c[0] == nm_cid)

    if kind_draw < 0.10:  # contributory-material-free -> no_entities
        body = (
            header
            + "CONCLUSION :\nI- Biopsies transbronchiques : matériel non contributif.\n"
            + "II- Lavage broncho-alvéolaire : liquide clair.\n"
        )
        return _interleave(rng, doc_id, body), gold, "no_entities"

    n_frag = rng.randint(2, 12)
    n_alv = rng.randint(1, n_frag)
    sentences = [
        f"I- Biopsies transbronchiques ({site_surface}) : {n_frag} fragments "
        f"biopsiques dont {n_alv} alvéolés."
    ]
    gold.append(("Site", site_surface, site_canonical))
    gold.append(("Nombre Total De Fragments", f"{n_frag} fragments", str(n_frag)))
    gold.append(
        ("Nombre Total De Fragments Alvéolés", f"{n_alv} alvéolés", str(n_alv))
    )

    if rng.random() < 0.9:
        sent, g = _grade_sentence(rng)
        sentences.append(sent)
        gold.extend(g)
    planted_surfaces = {s for _, s, _ in gold}
    for label, template, p in _OPTIONAL_LABELS:
        if rng.random() < p:
            sent, g = _concept_sentence(rng, label, template)
            if any(s in planted_surfaces for _, s, _ in g):
                continue
            sentences.append(sent)
            gold.extend(g)
            planted_surfaces.update(s for _, s, _ in g)

    # Always close with a lavage section: the reference's fallback end-marker
    # pack truncates at any bare digit '2' otherwise (end marker
    # r"(?:II|2)\s*[-\s]+" matches '2 fragments' / 'A2 B1'), which real BTB
    # reports avoid by having the lavage section — so do our fixtures.
    trailer = rng.choice(
        [
            "II- Lavage broncho-alvéolaire : liquide de cellularité normale.\n",
            "II- Lavage broncho-alvéolaire : profil habituel.\n",
            "II- Lavage broncho-alvéolaire : rares macrophages.\nSuresnes, le service.\n",
        ]
    )
    body = header + "CONCLUSION :\n" + " ".join(sentences) + "\n" + trailer
    return _interleave(rng, doc_id, body), gold, "ok"


def _interleave(rng: random.Random, doc_id: str, body: str):
    """Split body into 1-4 text chunks and interleave 0-3 media spans."""
    n_chunks = rng.randint(1, 4)
    cuts = sorted(rng.sample(range(1, max(2, len(body))), min(n_chunks - 1, len(body) - 2))) if n_chunks > 1 else []
    pieces, prev = [], 0
    for c in cuts:
        pieces.append(body[prev:c])
        prev = c
    pieces.append(body[prev:])
    spans = [{"kind": "text", "text": p, "media_ref": ""} for p in pieces]
    for _ in range(rng.randint(0, 3)):
        j = rng.randint(0, len(spans))
        spans.insert(
            j,
            {"kind": rng.choice(["image", "table"]), "text": "",
             "media_ref": f"media://{doc_id}/m{rng.randrange(10**6)}"},
        )
    for off, s in enumerate(spans):
        s["offset"] = off
    return {"doc_id": doc_id, "spans": spans}


def _generate(indices, seed: int = 42) -> dict[str, pa.Table]:
    """Generate the corpus tables for the given doc indices (per-doc RNG is
    (seed, index)-derived — any index partitioning reproduces the serial
    output exactly)."""
    docs, gold_ent, gold_tri, corr = [], [], [], []
    base_ts = _dt.datetime(2025, 1, 1, 8, 0, 0)
    for i in indices:
        row, gold, status = _gen_doc(seed, i)
        docs.append(row)
        if gold:
            text = "".join(
                s["text"] for s in sorted(row["spans"], key=lambda s: s["offset"])
            )
            conclusion = extract_conclusion(text)
            assert conclusion is not None, f"fixture doc {row['doc_id']} lost its section"
            seen = set()
            for label, surface, canonical in gold:
                pos = conclusion.find(surface)
                assert pos >= 0, (
                    f"planted surface {surface!r} not found in {row['doc_id']}"
                )
                gold_ent.append(
                    {
                        "doc_id": row["doc_id"],
                        "label": label,
                        "text": surface,
                        "start": pos,
                        "end": pos + len(surface),
                    }
                )
                key = (label_to_pred(label), canonical)
                if key not in seen:
                    seen.add(key)
                    gold_tri.append(
                        {"subj": row["doc_id"], "pred": key[0], "obj": key[1]}
                    )
            # corrections for ~10% of docs with entities
            rng = random.Random(seed * 7_368_787 + i)
            if rng.random() < 0.10:
                label, surface, canonical = rng.choice(gold)
                n_corr = rng.randint(1, 3)  # several -> tests LWW fold
                for k in range(n_corr):
                    corr.append(
                        {
                            "doc_id": row["doc_id"],
                            "entity_type": label,
                            "original_value": canonical,
                            "corrected_value": f"corrected-{i}-{k}",
                            "ts": base_ts + _dt.timedelta(seconds=i * 137 + k * 61),
                            "user": f"user{rng.randint(0, 4)}",
                        }
                    )

    return {
        "documents": pa.Table.from_pylist(docs, schema=DOCUMENTS_SCHEMA),
        "gold_entities": pa.Table.from_pylist(gold_ent, schema=GOLD_ENTITIES_SCHEMA),
        "gold_triples": pa.Table.from_pylist(gold_tri, schema=GOLD_TRIPLES_SCHEMA),
        "dictionary": dictionary_table(),
        "corrections": pa.Table.from_pylist(corr, schema=CORRECTIONS_SCHEMA),
    }


def corpus_dir(n_docs: int, seed: int = 42, root: str = "/tmp/gtb_fixtures") -> str:
    return os.path.join(root, f"seed{seed}_n{n_docs}")


def _gen_range(args) -> dict[str, pa.Table]:
    """Generate docs [lo, hi) — per-doc RNG is (seed, index)-derived, so any
    range partitioning produces output identical to the serial path."""
    seed, lo, hi = args
    return generate_corpus_range(lo, hi, seed)


def generate_corpus_range(lo: int, hi: int, seed: int = 42) -> dict[str, pa.Table]:
    """generate_corpus for the doc-index range [lo, hi)."""
    return _generate(range(lo, hi), seed)


def generate_corpus(n_docs: int, seed: int = 42) -> dict[str, pa.Table]:
    """Full corpus for n_docs (serial)."""
    return _generate(range(n_docs), seed)


def write_corpus(n_docs: int, seed: int = 42, root: str = "/tmp/gtb_fixtures",
                 shards: int = 1, parallel: bool | None = None) -> str:
    """Write the corpus as parquet under a deterministic cached path.

    `shards` > 1 splits the documents table into several files so Ray's
    read parallelism (and the checkpoint partitioner) has real input shards.
    `parallel` (default: auto for >= 5000 docs) generates shard ranges in a
    multiprocessing pool — output is byte-identical to the serial path
    because the per-doc RNG depends only on (seed, doc index)."""
    out = corpus_dir(n_docs, seed, root)
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    shards = max(1, shards)
    per = (n_docs + shards - 1) // shards
    ranges = [(seed, s * per, min((s + 1) * per, n_docs)) for s in range(shards)
              if s * per < n_docs]
    if parallel is None:
        parallel = n_docs >= 5000 and len(ranges) > 1
    tmp = out + ".tmp"
    os.makedirs(os.path.join(tmp, "documents"), exist_ok=True)
    if parallel:
        import multiprocessing as mp

        with mp.Pool(min(len(ranges), max(1, (os.cpu_count() or 4) - 2))) as pool:
            parts = pool.map(_gen_range, ranges)
    else:
        parts = [_gen_range(r) for r in ranges]
    side: dict[str, list[pa.Table]] = {}
    for s, tables in enumerate(parts):
        docs = tables.pop("documents")
        if docs.num_rows:
            pq.write_table(
                docs, os.path.join(tmp, "documents", f"part-{s:05d}.parquet")
            )
        for name, table in tables.items():
            side.setdefault(name, []).append(table)
    for name, chunks in side.items():
        if name == "dictionary":
            pq.write_table(chunks[0], os.path.join(tmp, f"{name}.parquet"))
        else:
            pq.write_table(
                pa.concat_tables(chunks), os.path.join(tmp, f"{name}.parquet")
            )
    open(os.path.join(tmp, "_COMPLETE"), "w").write("ok")
    if os.path.exists(out):  # stale partial dir from a killed run
        import shutil

        shutil.rmtree(out)
    os.replace(tmp, out)
    return out
