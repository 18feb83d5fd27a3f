"""Fixture-generator guarantees the golden P/R gate relies on."""

import re

from gliner_transbronchialbiopsy_ray import fixtures, lexicon


def test_deterministic():
    a = fixtures.generate_corpus(50, seed=42)
    b = fixtures.generate_corpus(50, seed=42)
    for name in a:
        assert a[name].equals(b[name]), name


def test_noise_vocab_disjoint_from_lexicon():
    """The lexicon must find nothing in pure noise text — otherwise planted
    gold != extractable entities and precision is meaningless."""
    noise = " ".join(fixtures._NOISE_WORDS) + " " + fixtures._HEADER
    pats = lexicon.label_patterns()
    for label, pat in pats.items():
        assert not pat.search(noise), (label, pat.search(noise).group(0))


def test_statuses_and_media_present():
    tables = fixtures.generate_corpus(200, seed=42)
    docs = tables["documents"].to_pylist()
    kinds = {s["kind"] for d in docs for s in d["spans"]}
    assert {"text", "image"} <= kinds
    # every doc's spans are offset-ordered 0..n-1
    for d in docs:
        offs = [s["offset"] for s in d["spans"]]
        assert offs == list(range(len(offs)))


def test_gold_offsets_point_at_surface():
    from gliner_transbronchialbiopsy_ray.stages.assemble import assemble_text
    from gliner_transbronchialbiopsy_ray.stages.normalize import extract_conclusion

    tables = fixtures.generate_corpus(60, seed=7)
    texts = {}
    for d in tables["documents"].to_pylist():
        t = "".join(
            s["text"] for s in sorted(d["spans"], key=lambda s: s["offset"])
        )
        c = extract_conclusion(t)
        texts[d["doc_id"]] = c
    for g in tables["gold_entities"].to_pylist():
        c = texts[g["doc_id"]]
        assert c is not None
        assert c[g["start"] : g["end"]] == g["text"]
