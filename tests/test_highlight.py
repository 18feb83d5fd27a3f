"""M9 highlight_entities (reference dashboard_v1.py:54-73): offset-based
splice — unlike the reference's regex-replace, repeated surface forms and
HTML-special characters must not corrupt the markup."""

import pyarrow as pa

from gliner_transbronchialbiopsy_ray.stages.highlight import (
    _render_row,
    highlight_batch,
)


def _ent(text, label, start, end, score=0.9):
    return {"text": text, "label": label, "score": score,
            "start": start, "end": end}


def test_single_span_wrapped_with_tooltip():
    html = _render_row("grade A2 rejection", [_ent("A2", "rejection_grade", 6, 8)])
    assert '<span class="highlighted-entity"' in html
    assert '>A2<span class="entity-tooltip">rejection_grade</span></span>' in html
    assert html.startswith("grade ")
    assert html.endswith(" rejection")


def test_repeated_surface_form_highlights_only_the_span():
    # the reference's re.sub would wrap BOTH occurrences of "A2"
    html = _render_row("A2 then A2", [_ent("A2", "rejection_grade", 8, 10)])
    assert html.count("highlighted-entity") == 1
    assert html.startswith("A2 then <span")


def test_html_specials_escaped_and_offsets_preserved():
    text = "a<b & grade A2"
    html = _render_row(text, [_ent("A2", "rejection_grade", 12, 14)])
    assert "a&lt;b &amp; grade" in html
    assert ">A2<span" in html  # span body is exactly the entity text


def test_multiple_spans_spliced_right_to_left():
    text = "mild fibrosis with acute inflammation"
    html = _render_row(text, [
        _ent("fibrosis", "fibrosis", 5, 13),
        _ent("inflammation", "inflammation", 25, 37),
    ])
    assert html.count("highlighted-entity") == 2
    assert html.index("fibrosis") < html.index("inflammation")


def test_bad_span_is_skipped_not_corrupting():
    html = _render_row("short", [_ent("x", "infection", 3, 99)])
    assert html == "short"


def test_batch_passthrough_and_empty_entities():
    batch = pa.table({
        "doc_id": ["d1", "d2"],
        "conclusion": ["grade A2", ""],
        "status": ["ok", "no_text"],
        "entities": [[_ent("A2", "rejection_grade", 6, 8)], []],
    })
    out = highlight_batch(batch)
    assert list(out.columns) == ["doc_id", "status", "html"]
    assert len(out) == 2  # no silent drops
    assert "highlighted-entity" in out["html"][0]
    assert out["html"][1] == ""
