"""Unit tests: NER backend contract, overlap merge (D2), entity linking (J3)."""

import pyarrow as pa

from gliner_transbronchialbiopsy_ray.config import LABELS
from gliner_transbronchialbiopsy_ray.lexicon import deterministic_score
from gliner_transbronchialbiopsy_ray.stages.link import EntityLinker
from gliner_transbronchialbiopsy_ray.stages.ner import (
    LexiconBackend,
    merge_overlapping,
)


def test_lexicon_backend_contract():
    text = (
        "I- Biopsies transbronchiques (lobe moyen) : 7 fragments biopsiques "
        "dont 5 alvéolés. Absence de rejet aigu : A0 B0. Immunomarquage : "
        "C4d négatif."
    )
    ents = LexiconBackend().predict([text], LABELS, 0.5)[0]
    by_label = {e["label"]: e for e in ents}
    assert by_label["Site"]["text"] == "lobe moyen"
    assert by_label["Nombre Total De Fragments"]["text"] == "7 fragments"
    assert by_label["Nombre Total De Fragments Alvéolés"]["text"] == "5 alvéolés"
    assert by_label["Grade A"]["text"] == "A0"
    assert by_label["Grade B"]["text"] == "B0"
    assert by_label["Coloration C4d"]["text"] == "C4d négatif"
    for e in ents:
        assert text[e["start"] : e["end"]] == e["text"]
        assert 0.5 <= e["score"] < 1.0
        assert e["score"] == round(e["score"], 3)
    # spans sorted by (start, -end)
    keys = [(e["start"], -e["end"]) for e in ents]
    assert keys == sorted(keys)


def test_label_subset_is_runtime_parameter():
    text = "Biopsies transbronchiques (LID) : 7 fragments. A2 B1."
    ents = LexiconBackend().predict([text], ["Grade A", "Grade B"], 0.5)[0]
    assert {e["label"] for e in ents} == {"Grade A", "Grade B"}


def test_threshold_filters():
    text = "Présence de CMV."
    s = deterministic_score("Infection", "CMV")
    assert LexiconBackend().predict([text], ["Infection"], s + 0.001)[0] == []
    assert len(LexiconBackend().predict([text], ["Infection"], s)[0]) == 1


def test_merge_overlapping_keeps_max_score():
    ents = [
        {"text": "A", "label": "x", "score": 0.6, "start": 0, "end": 10},
        {"text": "B", "label": "y", "score": 0.9, "start": 1, "end": 10},  # IoU 0.9
        {"text": "C", "label": "z", "score": 0.7, "start": 50, "end": 60},
    ]
    merged = merge_overlapping(ents)
    assert [e["text"] for e in merged] == ["B", "C"]


def test_merge_no_overlap_untouched():
    ents = [
        {"text": "A", "label": "x", "score": 0.6, "start": 0, "end": 5},
        {"text": "B", "label": "y", "score": 0.9, "start": 6, "end": 10},
    ]
    assert len(merge_overlapping(ents)) == 2


def test_linker_exact_and_similarity_and_numeric():
    batch = pa.table(
        {
            "label": ["Site", "Site", "Nombre Total De Fragments", "Site"],
            "obj": [
                "lobe inférieur droit",   # exact alias
                "lobe inferieur droit",   # near-miss -> similarity fallback
                "7 fragments",            # numeric parse
                "zzz inconnu",            # unlinkable -> lowercased surface
            ],
        }
    )
    out = EntityLinker()(batch)
    objs = out.column("obj").to_pylist()
    cids = out.column("canonical_id").to_pylist()
    assert objs[0] == "LID" and cids[0] == "SITE_LID"
    assert objs[1] == "LID" and cids[1] == "SITE_LID"
    assert objs[2] == "7" and cids[2] == ""
    assert cids[3] == "" and objs[3] == "zzz inconnu"


def test_site_codes_respect_word_boundaries():
    # "LID" must not fire inside "VALIDE"; accented words bound correctly
    ents = LexiconBackend().predict(
        ["Résultat VALIDE sans LID ni LSDx, mais LM oui."], ["Site"], 0.5
    )[0]
    texts = [e["text"] for e in ents]
    assert "LM" in texts
    assert texts.count("LID") == 1  # the standalone one only
    assert all(t != "LSD" for t in texts)  # LSDx is not LSD


def test_plus_grade_notation_reformat():
    from gliner_transbronchialbiopsy_ray.stages.normalize import (
        format_grade_notations,
    )

    assert format_grade_notations("A+B+") == "A+ B+"
    assert format_grade_notations("grade b2") == "Grade b2"


def test_ed_le1_cases():
    from gliner_transbronchialbiopsy_ray.stages.link import _ed_le1
    assert _ed_le1("abc", "abc")
    assert _ed_le1("abc", "abd")       # substitution
    assert _ed_le1("abc", "ab")        # deletion
    assert _ed_le1("abc", "xabc")      # insertion at front
    assert not _ed_le1("abc", "adc2")  # sub + insert = 2
    assert not _ed_le1("abc", "a")     # two deletions
    assert not _ed_le1("abcd", "dcba")


def test_edit1_join_matches_bruteforce():
    import numpy as np
    import ray.data as rd
    from gliner_transbronchialbiopsy_ray.stages.link import edit1_join

    left = ["widget", "gasket", "ring", "bolt", "flange", "washer"]
    right = ["widgot", "gasket", "rings", "bol", "xwasher", "nut",
             "fling", "widget!"]
    lds = rd.from_items([{"name": s} for s in left]).repartition(3)
    rds = rd.from_items([{"name": s} for s in right]).repartition(2)
    got = sorted(map(tuple, edit1_join(lds, rds).to_pandas()
                     [["left", "right"]].to_numpy()))

    def ed(a, b):
        dp = list(range(len(b) + 1))
        for i, x in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, y in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (x != y))
        return dp[-1]

    want = sorted((a, b) for a in left for b in right if ed(a, b) <= 1)
    assert got == want and len(want) >= 5
