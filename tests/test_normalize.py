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
