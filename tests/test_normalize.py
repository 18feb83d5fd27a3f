"""Unit tests for M1-M3 (clean/segment/grade-format) reference parity."""

from gliner_transbronchialbiopsy_ray.stages.normalize import (
    clean_text,
    extract_conclusion,
    format_grade_notations,
)


def test_clean_text_whitespace_and_punct():
    assert clean_text("a   b\n\nc") == "a b c"
    assert clean_text("mot ,  suite") == "mot, suite"
    # « » stripped; punct-spacing runs before multi-dot collapse (reference
    # order), so '...' becomes '. . .'
    assert clean_text("fin...») ") == "fin. . . )"
    assert clean_text("fin.. suite") == "fin. . suite"
    # unicode dashes fall outside the char whitelist (reference strips them
    # before its dash-normalization step); ASCII hyphen runs collapse
    assert clean_text("tiret — long – court") == "tiret  long  court"
    assert clean_text("a --- b") == "a - b"


def test_format_grades():
    assert format_grade_notations("A0B0") == "A0 B0"
    assert format_grade_notations("a1b0") == "A1 B0"
    assert format_grade_notations("AxB0") == "Ax B0"
    assert format_grade_notations("A1-B0") == "A1 B0"
    assert format_grade_notations("grade a2") == "Grade a2"


def test_extract_conclusion_happy_path():
    text = (
        "En-tête du service.\nCONCLUSION :\n"
        "I- Biopsies transbronchiques (LID) : 7 fragments biopsiques dont "
        "5 alvéolés. Absence de rejet aigu : A0B0.\n"
        "II- Lavage broncho-alvéolaire : normal.\n"
    )
    c = extract_conclusion(text)
    assert c is not None
    assert c.startswith("I- Biopsies transbronchiques (LID)")
    assert "A0 B0" in c  # grade reformat applied
    assert "Lavage" not in c  # section ends before lavage


def test_extract_conclusion_absent():
    assert extract_conclusion("Rien d'intéressant ici.") is None
    assert extract_conclusion("") is None
    # conclusion without a biopsy section
    assert extract_conclusion("CONCLUSION : rien de notable.") is None


def test_clean_text_column_matches_clean_text_rowwise():
    """clean_text_column (Arrow RE2 fast path + per-row fallback) must
    equal clean_text row-for-row on ANY input — safe French/ASCII rows,
    engine-disagreement rows (exotic whitespace, non-Latin scripts,
    \\u2028, NBSP, combining marks), empties and nulls."""
    import pyarrow as pa

    from gliner_transbronchialbiopsy_ray.stages.normalize import (
        clean_text,
        clean_text_column,
    )

    rows = [
        None, "", "   ", "plain ascii.",
        "CONCLUSION : grade A1-B0 observé…",
        "café au lait",           # NBSP -> NFKC space
        "tabs\tand\nnewlines\r\nhere",
        "exotic line separators", # py \s matches, RE2 doesn't
        "vertical\x0btab and \x85 NEL",     # ditto
        "Кириллица and 中文 text",           # py \w keeps, RE2 strips
        "mixed ascii + œuvre + ¼ + ²",      # NFKC compat expansions
        "dash – variants — here ― ok",
        "été decomposed",       # combining marks -> NFKC composes
        "weird @#$%^&* strip&()[]{}\"'-",
        "dots... everywhere.... !",
        "punct  ,  spaced   ;x",
    ]
    got = clean_text_column(pa.array(rows, type=pa.string())).to_pylist()
    exp = [clean_text(t) if t is not None else None for t in rows]
    assert got == exp


def test_clean_text_column_hypothesis_equivalence():
    from hypothesis import given, settings
    from hypothesis import strategies as st
    import pyarrow as pa

    from gliner_transbronchialbiopsy_ray.stages.normalize import (
        clean_text,
        clean_text_column,
    )

    @settings(max_examples=120, deadline=None)
    @given(st.lists(st.text(max_size=60), max_size=8))
    def check(rows):
        got = clean_text_column(pa.array(rows, type=pa.string())).to_pylist()
        assert got == [clean_text(t) for t in rows]

    check()
