"""Clinical report synthesis from ISIC-2024 tabular metadata.

Behavioral re-implementation of the reference's templated report generator
(reference: src/mamba_clip/utils/data_utils.py — ``generate_report_v2``
:478-554, ``get_patient_information`` :9-101, ``get_target_info`` :439-475
and the 12 per-measurement ``get_*_info`` helpers):

- a patient sentence built from (age, sex, anatomical site) with template
  pools for every present/absent combination;
- one sentence per tabular measurement column when the value is present:
  diameter, hue, area, border jaggedness, color irregularity, contrast,
  eccentricity, location, minor axis, nevus confidence, border
  irregularity, color variation, perimeter, radial color asymmetry,
  bi-axial symmetry;
- an optional diagnosis sentence drawn from the iddx_1..5 hierarchy;
- train mode: random template choice per sentence, optional sentence-order
  shuffle, per-sentence dropout (reference default 0.1 via the dataset);
  eval mode: deterministic (always template[0], no dropout, no shuffle).

Template *text* here is original; parity is at the information level (which
columns appear, conditioning, randomization semantics), which is what the
contrastive objective consumes. Randomness comes from an explicit
``numpy.random.Generator`` so data workers are reproducible per (seed,
epoch, index) — the reference relies on global numpy/random state.
"""

from __future__ import annotations

import math
from typing import Any, Mapping, Optional

import numpy as np


def _missing(v: Any) -> bool:
    if v is None:
        return True
    try:
        return bool(np.isnan(v))
    except (TypeError, ValueError):
        return isinstance(v, float) and math.isnan(v)


def _pick(rng: Optional[np.random.Generator], options, is_eval: bool):
    if is_eval or rng is None:
        return options[0]
    return options[int(rng.integers(len(options)))]


# -- patient sentence -------------------------------------------------------

_PATIENT_TEMPLATES = {
    "all": [
        "This is a {age} year old {sex} patient with a skin lesion on the {site}.",
        "A skin lesion on the {site} was observed in a {sex} patient of {age} years.",
        "The {sex} patient ({age} years) showed a lesion arising on the {site}.",
        "Lesion site: {site}; patient: {sex}, {age} years of age.",
        "Examined a {age}-year-old {sex} whose lesion is situated on the {site}.",
        "The record describes a {sex} individual, {age} years old, with a {site} lesion.",
    ],
    "age_sex": [
        "This is a {age} year old {sex} patient with a skin lesion.",
        "A skin lesion was observed in a {sex} patient of {age} years.",
        "The {sex} patient, {age} years of age, showed a skin lesion.",
        "Examined a {age}-year-old {sex} presenting a lesion.",
    ],
    "age_site": [
        "This is a roughly {age} year old patient with a skin lesion on the {site}.",
        "A lesion on the {site} was observed in a patient of about {age} years.",
        "The patient, near {age} years of age, showed a lesion on the {site}.",
    ],
    "sex_site": [
        "This is a {sex} patient with a skin lesion on the {site}.",
        "A lesion on the {site} was observed in a {sex} patient.",
        "The {sex} patient showed a lesion arising on the {site}.",
    ],
    "age": [
        "This is a roughly {age} year old patient with a skin lesion.",
        "A skin lesion was observed in a patient of about {age} years.",
        "The patient, near {age} years of age, showed a skin lesion.",
    ],
    "sex": [
        "This is a {sex} patient with a skin lesion.",
        "A skin lesion was observed in a {sex} patient.",
        "The {sex} patient showed a skin lesion.",
    ],
    "site": [
        "The skin lesion is located on the {site}.",
        "A lesion was observed on the {site}.",
        "The imaged lesion arises on the {site}.",
    ],
}


def _patient_pool(row: Mapping[str, Any]):
    """(template pool, format kwargs) for the patient sentence, or None."""
    age = None if _missing(row.get("age_approx")) else int(row["age_approx"])
    sex = None if _missing(row.get("sex")) else str(row["sex"])
    site = (
        None
        if _missing(row.get("anatom_site_general"))
        else str(row["anatom_site_general"])
    )
    if age and sex and site:
        key = "all"
    elif age and sex:
        key = "age_sex"
    elif age and site:
        key = "age_site"
    elif sex and site:
        key = "sex_site"
    elif age:
        key = "age"
    elif sex:
        key = "sex"
    elif site:
        key = "site"
    else:
        return None
    return _PATIENT_TEMPLATES[key], {"age": age, "sex": sex, "site": site}


def patient_sentence(row: Mapping[str, Any], rng=None, is_eval: bool = False):
    pool = _patient_pool(row)
    if pool is None:
        return None
    templates, kw = pool
    return _pick(rng, templates, is_eval).format(**kw)


# -- measurement sentences ---------------------------------------------------
# column -> (value renderer, template pool)

_MEASUREMENTS = [
    (
        "clin_size_long_diam_mm",
        lambda v: round(float(v), 1),
        [
            "The largest diameter of the lesion measures {v} mm.",
            "Maximum lesion diameter: {v} mm.",
            "The lesion spans up to {v} mm across.",
        ],
    ),
    (
        "tbp_lv_H",
        lambda v: round(float(v), 2),
        [
            "Interior hue registers {v}.",
            "Within the lesion the hue value is {v}.",
            "A hue of {v} characterises the lesion interior.",
        ],
    ),
    (
        "tbp_lv_areaMM2",
        lambda v: round(float(v), 2),
        [
            "The lesion covers an area of {v} square millimetres.",
            "Lesion area: {v} mm^2.",
            "An area of {v} mm^2 is occupied by the lesion.",
        ],
    ),
    (
        "tbp_lv_area_perim_ratio",
        lambda v: round(float(v), 2),
        [
            "Border jaggedness, expressed as area-to-perimeter ratio, is {v}.",
            "The area-to-perimeter ratio of the border comes to {v}.",
            "Jaggedness of the outline rates {v}.",
        ],
    ),
    (
        "tbp_lv_color_std_mean",
        lambda v: round(float(v), 2),
        [
            "Color irregularity within the lesion scores {v}.",
            "The internal color irregularity measure is {v}.",
            "A color irregularity value of {v} was computed.",
        ],
    ),
    (
        "tbp_lv_deltaLBnorm",
        lambda v: round(float(v), 2),
        [
            "Contrast between the lesion and adjacent skin equals {v}.",
            "The lesion-to-skin contrast measures {v}.",
            "A contrast value of {v} separates lesion and surrounding skin.",
        ],
    ),
    (
        "tbp_lv_eccentricity",
        lambda v: round(float(v), 2),
        [
            "Shape eccentricity of the lesion is {v}.",
            "The lesion's eccentricity comes to {v}.",
            "An eccentricity of {v} describes the lesion outline.",
        ],
    ),
    (
        "tbp_lv_location_simple",
        str,
        [
            "In simplified terms the lesion maps to the {v}.",
            "Simplified anatomical location: {v}.",
            "The lesion falls within the {v} region.",
        ],
    ),
    (
        "tbp_lv_minorAxisMM",
        lambda v: round(float(v), 2),
        [
            "The minor axis of the lesion measures {v} mm.",
            "Smallest lesion diameter: {v} mm.",
            "Across its minor axis the lesion spans {v} mm.",
        ],
    ),
    (
        "tbp_lv_nevi_confidence",
        lambda v: round(float(v), 2),
        [
            "The nevus confidence score is {v}.",
            "Confidence that this is a nevus: {v}.",
            "A nevus-likeness confidence of {v} was assigned.",
        ],
    ),
    (
        "tbp_lv_norm_border",
        lambda v: round(float(v), 2),
        [
            "Normalised border irregularity equals {v}.",
            "The border irregularity index is {v}.",
            "Border irregularity (normalised) rates {v}.",
        ],
    ),
    (
        "tbp_lv_norm_color",
        lambda v: round(float(v), 2),
        [
            "Normalised color variation equals {v}.",
            "The color variation index is {v}.",
            "Color variation (normalised) rates {v}.",
        ],
    ),
    (
        "tbp_lv_perimeterMM",
        lambda v: round(float(v), 2),
        [
            "The lesion perimeter measures {v} mm.",
            "Perimeter length: {v} mm.",
            "A perimeter of {v} mm encloses the lesion.",
        ],
    ),
    (
        "tbp_lv_radial_color_std_max",
        lambda v: round(float(v), 2),
        [
            "Radial color asymmetry peaks at {v}.",
            "The maximum radial color deviation is {v}.",
            "Color asymmetry along radii reaches {v}.",
        ],
    ),
]

_SYMMETRY_TEMPLATES = [
    "Bi-axial symmetry scores {symm} at an angle of {angle} degrees.",
    "The lesion's two-axis symmetry is {symm} (axis angle {angle} deg).",
    "Symmetry about two axes: {symm}, oriented at {angle} degrees.",
]

_TARGET_TEMPLATES = [
    "The diagnosis for this lesion is {dx}.",
    "Clinically, the lesion corresponds to {dx}.",
    "Pathology identifies the lesion as {dx}.",
    "This lesion was determined to represent {dx}.",
]


def target_sentence(row: Mapping[str, Any], rng=None, is_eval: bool = False):
    """Diagnosis sentence from the iddx hierarchy
    (reference: get_target_info, data_utils.py:439-475)."""
    dxs = [
        row[k]
        for k in ("iddx_1", "iddx_2", "iddx_3", "iddx_4", "iddx_5")
        if k in row and not _missing(row.get(k))
    ]
    if not dxs:
        return None
    dx = dxs[0] if (is_eval or rng is None) else dxs[int(rng.integers(len(dxs)))]
    t = _pick(rng, _TARGET_TEMPLATES, is_eval)
    return t.format(dx=dx)


def generate_report(
    row: Mapping[str, Any],
    is_eval: bool = False,
    shuffle: bool | float = False,
    dropout: float = 0.0,
    include_target: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> str:
    """Assemble the report (reference: generate_report_v2,
    data_utils.py:478-554)."""
    if rng is None:
        rng = np.random.default_rng()
    if is_eval:
        dropout = 0.0
    parts = []
    p = patient_sentence(row, rng, is_eval)
    if p:
        parts.append(p)
    for col, render, templates in _MEASUREMENTS:
        v = row.get(col)
        if _missing(v):
            continue
        if dropout > 0.0 and rng.random() < dropout:
            continue
        t = _pick(rng, templates, is_eval)
        parts.append(t.format(v=render(v)))
    if not _missing(row.get("tbp_lv_symm_2axis")) and not _missing(
        row.get("tbp_lv_symm_2axis_angle")
    ):
        if not (dropout > 0.0 and rng.random() < dropout):
            t = _pick(rng, _SYMMETRY_TEMPLATES, is_eval)
            parts.append(
                t.format(
                    symm=round(float(row["tbp_lv_symm_2axis"]), 2),
                    angle=int(row["tbp_lv_symm_2axis_angle"]),
                )
            )
    if shuffle and not is_eval:
        do = rng.random() < shuffle if isinstance(shuffle, float) else True
        if do:
            rng.shuffle(parts)
    if include_target:
        t = target_sentence(row, rng, is_eval)
        if t:
            parts.append(t)
    return " ".join(parts)


def report_token_upper_bound(
    row: Mapping[str, Any],
    count_tokens,
    include_target: bool = False,
) -> int:
    """Exact upper bound on the token count of any report draw for ``row``.

    Sentence dropout only removes sentences and shuffle only reorders them,
    so the longest possible draw keeps every sentence and picks, per slot,
    the longest template (and for the diagnosis slot the longest iddx
    rendering). Sentences are joined by a single space, and both shipped
    tokenizers pre-split on whitespace (HashTokenizer's word regex; BERT
    WordPiece), so tokens never merge across sentence boundaries and
    ``count(join(parts)) == sum(count(p) for p in parts)`` — the sum of
    per-slot maxima is therefore the exact maximum, not an estimate.

    ``count_tokens``: str -> int WITHOUT special tokens (the tokenizers'
    ``count_tokens`` method). Used by ``--text-context auto`` (tokenizer.
    resolve_text_context) to size the padded context to the dataset instead
    of the reference's fixed 256 (reference: model.py:1007 — it pads and
    attends over every trailing pad column).
    """
    total = 0
    pool = _patient_pool(row)
    if pool is not None:
        templates, kw = pool
        total += max(count_tokens(t.format(**kw)) for t in templates)
    for col, render, templates in _MEASUREMENTS:
        v = row.get(col)
        if _missing(v):
            continue
        rv = render(v)
        total += max(count_tokens(t.format(v=rv)) for t in templates)
    if not _missing(row.get("tbp_lv_symm_2axis")) and not _missing(
        row.get("tbp_lv_symm_2axis_angle")
    ):
        symm = round(float(row["tbp_lv_symm_2axis"]), 2)
        angle = int(row["tbp_lv_symm_2axis_angle"])
        total += max(
            count_tokens(t.format(symm=symm, angle=angle))
            for t in _SYMMETRY_TEMPLATES
        )
    if include_target:
        dxs = [
            row[k]
            for k in ("iddx_1", "iddx_2", "iddx_3", "iddx_4", "iddx_5")
            if k in row and not _missing(row.get(k))
        ]
        if dxs:
            total += max(
                count_tokens(t.format(dx=dx))
                for t in _TARGET_TEMPLATES
                for dx in dxs
            )
    return total


# Backwards-compatible alias matching the reference's public name.
generate_report_v2 = generate_report
