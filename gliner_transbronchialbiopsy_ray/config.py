"""Engine configuration: label vocabulary, section-segmentation regex packs,
thresholds.  The label set is *data, not schema* (reference passes it
per-call: /root/reference/src/streamlit/app/models/model_handler.py:166-170);
everything here is a runtime parameter a pipeline can override.

Behavioral parity targets (reference file:line):
- labels:        src/streamlit/app/config.py:39-54
- patterns:      src/streamlit/app/config.py:78-92
- thresholds:    src/streamlit/app/config.py:11-13
- encodings:     src/streamlit/app/config.py:93-102
- pred mapping:  src/finetuning/data/json_convertissor.py:43-58
"""

from __future__ import annotations

from dataclasses import dataclass, field

# The 14-label closed vocabulary of the reference dashboard.
LABELS: list[str] = [
    "Site",
    "Nombre Total De Fragments",
    "Nombre Total De Fragments Alvéolés",
    "Grade A",
    "Grade B",
    "Rejet Chronique",
    "Coloration C4d",
    "Lésion Septale",
    "Lésion Intra-Alvéolaire",
    "Éosinophilie",
    "Pneumonie Organisée",
    "DAD",
    "Infection",
    "Autre Pathologie",
]

# French label -> snake_case predicate stem (same mapping the reference's
# annotation ETL uses for its English->snake column translation).
LABEL_TO_SNAKE: dict[str, str] = {
    "Site": "site",
    "Nombre Total De Fragments": "nombre_total_de_fragments",
    "Nombre Total De Fragments Alvéolés": "nombre_total_de_fragments_alveoles",
    "Grade A": "grade_a",
    "Grade B": "grade_b",
    "Rejet Chronique": "rejet_chronique",
    "Coloration C4d": "coloration_c4d",
    "Lésion Septale": "lesion_septale",
    "Lésion Intra-Alvéolaire": "lesion_intra_alveolaire",
    "Éosinophilie": "eosinophilie",
    "Pneumonie Organisée": "pneumonie_organisee",
    "DAD": "dad",
    "Infection": "infection",
    "Autre Pathologie": "autre_pathologie",
}

SNAKE_TO_LABEL: dict[str, str] = {v: k for k, v in LABEL_TO_SNAKE.items()}


def label_to_pred(label: str) -> str:
    """Triple predicate for an entity label, e.g. 'Grade A' -> 'has_grade_a'."""
    return "has_" + LABEL_TO_SNAKE.get(label, label.lower().replace(" ", "_"))


# Section-segmentation regex packs (conclusion header -> biopsy sub-section ->
# end at lavage / trailing markers).  Config-driven so users can swap packs.
CONCLUSION_PATTERNS: list[str] = [
    r"C\s*O\s*N\s*C\s*L\s*U\s*S\s*I\s*O\s*N\s*[\n\r]*",
    r"(?i)CONCLUSION[\s:]+",
    r"(?i)CONCLUSION ET SYNTHESE[\s:]+",
    r"(?i)SYNTHESE[\s:]+",
]
BIOPSY_PATTERNS: list[str] = [
    r"(?:I\s*[-\s]+)?(?:B|b)iopsies?\s+(?:t|T)ransbronchiques?(?:\s*\([^)]*\))?[\s:]+",
    r"(?:I\s*[-\s]+)(?:B|b)iopsies?\s+(?:t|T)ransbronchiques?(?:\s*\([^)]*\))?",
    r"I\s*[-\s]+.*?(?:fragments?\s+biopsiques)",
]
LAVAGE_PATTERNS: list[str] = [
    r"(?:II|2)\s*[-\s]+(?:L|l)avage\s+(?:b|B)roncho[\s-]*(?:a|A)lvéolaire",
    r"(?:L|l)avage\s+(?:b|B)roncho[\s-]*(?:a|A)lvéolaire",
]
END_MARKERS: list[str] = [
    r"(?:II|2)\s*[-\s]+",
    r"Suresnes,",
    r"ADICAP",
    r"Compte-rendu",
    r"\n\s*\n",
]

# TXT decode fallback chain (S2).
ENCODING_ATTEMPTS: list[str] = [
    "utf-8", "latin1", "iso-8859-1", "cp1252", "windows-1252", "ascii", "mac_roman",
]

DEFAULT_CONFIDENCE_THRESHOLD: float = 0.5
MAX_SEQUENCE_LENGTH: int = 512  # reference hard-truncates; we keep it opt-in
MAX_FILE_SIZE: int = 10 * 1024 * 1024
ALLOWED_FILE_TYPES: tuple[str, ...] = ("pdf", "txt")
OVERLAP_MERGE_THRESHOLD: float = 0.5  # IoU for span merge (keep max score)


def configure_data_context(
    target_max_block_mb: int = 128,
    preserve_order: bool = False,
    progress_bars: bool = False,
) -> None:
    """Apply the engine's recommended Ray Data execution knobs.

    - block size: 128 MiB default; LOWER it for corpora with huge media
      payloads per row so a batch × pool concurrency fits worker heaps
      (media stay refs in this engine, so the default is fine);
    - preserve_order stays False (span order is IN-ROW, never inter-block —
      ordered execution would only cost pipelining);
    - progress bars off for clean driver/bench logs."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.target_max_block_size = target_max_block_mb << 20
    ctx.execution_options.preserve_order = preserve_order
    ctx.enable_progress_bars = progress_bars


@dataclass
class PipelineConfig:
    """Per-run knobs for the KG-construction pipeline.

    Sized for a multi-node cluster streaming ~100 TB: NER batches stay small
    (model-bound), text stages use large Arrow batches, the canonicalization
    shuffle is salted (hot canonical values like "A0" are power-law skewed).
    """

    labels: list[str] = field(default_factory=lambda: list(LABELS))
    threshold: float = DEFAULT_CONFIDENCE_THRESHOLD
    truncate_chars: int | None = None  # set 512 for reference-parity mode
    ner_batch_size: int = 256
    ner_concurrency: int | tuple[int, int] = 4
    ner_num_cpus: float = 1.0  # fraction <1 lets small clusters pipeline
    ner_num_gpus: float = 0.0  # set >0 on GPU clusters (real GLiNER backend)
    ner_blocks: int | None = None  # repartition before NER: actor-pool
    # parallelism is bounded by BLOCK count (one block per actor task), so
    # size this to >= pool size x 2; None keeps upstream blocking
    text_batch_size: int | None = 4096
    salt_buckets: int = 16
    model_backend: str = "lexicon"  # "lexicon" | "gliner"
    model_path: str | None = None
    work_factor: int = 1  # lexicon-backend compute emulation (bench only)

    def validate(self) -> None:
        """Config self-validation (reference config.py:177-190 analog):
        fail fast at pipeline build time, not in a worker at first batch."""
        if not self.labels:
            raise ValueError("labels must be non-empty")
        if not 0.0 <= self.threshold <= 1.0:
            raise ValueError(f"threshold {self.threshold} outside [0, 1]")
        if self.ner_batch_size <= 0:
            raise ValueError("ner_batch_size must be positive")
        if self.truncate_chars is not None and self.truncate_chars <= 0:
            raise ValueError("truncate_chars must be positive or None")
        if self.model_backend not in ("lexicon", "gliner"):
            raise ValueError(f"unknown model_backend {self.model_backend!r}")
