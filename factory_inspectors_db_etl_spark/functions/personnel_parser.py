"""Personnel-cell parser (SURVEY.md §2.10 U1 — the flagship UDF).

Free text ("Инж.-тех. Н. С. В. П. Гаринъ.<br>съ 10 дек. вакансія.") ->
list of assignment structs.  Semantics match the reference's
``parse_personnel_string_v4`` (populate_db_ru_v1.py:304-501) including its
quirks (note-concatenation without separators, first-date-wins, dictionary
longest-match-first with span removal, ±dot key variants, the <=4-word
name heuristic, date-only vacancy inference).

Spark surface: ``parse_personnel_udf`` — an Arrow-batched pandas UDF
returning ``ARRAY<STRUCT<...>>`` for ``explode`` (one input row -> N
assignment rows).  The dictionaries are module constants compiled to
regex lists once per executor (the broadcast-dictionary pattern; at 100 TB
scale the same structure would ship via ``SparkContext.broadcast``).
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .dictionaries import KNOWN_EDUCATIONS, KNOWN_PROFESSIONS, KNOWN_RANKS
from .text import standardize_text_py

ASSIGNMENT_TYPE = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("rank_abbr", T.StringType()),
        T.StructField("prof_abbr", T.StringType()),
        T.StructField("edu_abbr", T.StringType()),
        T.StructField("start_date_raw", T.StringType()),
        T.StructField("end_date_raw", T.StringType()),
        T.StructField("is_vacancy", T.BooleanType()),
        T.StructField("is_acting", T.BooleanType()),
        T.StructField("notes", T.StringType()),
        T.StructField("special_role", T.StringType()),
    ]
)

_BR_RE = re.compile(r"<br\s*/?>", re.IGNORECASE)
_DATE_RE = re.compile(
    r"(?:(?P<prefix>съ|с|до|по)\s+(?P<day>\d{1,2})\s+(?P<month>[а-яѣію]+(?:(?:\.|ъ|ь)\s*)?))",
    re.IGNORECASE,
)
_VACANCY_RE = re.compile(r"\bвакансія\b|\bвакансия\b", re.IGNORECASE)
_ACTING_RE = re.compile(r"\bи\. ?д\.", re.IGNORECASE)
_NOTE_RE = re.compile(r"\(([^)]+)\)")
_NEIM_CHINA_RE = re.compile(r"\bнеим\.? чина\b", re.IGNORECASE)
_DEATH = "†"

# Three-alternative name matcher (populate_db_ru_v1.py:320-324):
# "Surname И. О." | "И. О. Surname" | bare "Surname".
_NAME_RE = re.compile(
    r"([А-ЯЁѢІѲ][а-яёѣіѳ]+(?:[-][А-ЯЁѢІѲ][а-яёѣіѳ]+)?\s+[А-ЯЁѢІѲ]\.\s*(?:[А-ЯЁѢІѲ]\.)?)"
    r"|((?:[А-ЯЁѢІѲ]\.\s*){1,2}\s*[А-ЯЁѢІѲ][а-яёѣіѳ]+(?:[-][А-ЯЁѢІѲ][а-яёѣіѳ]+)?)"
    r"|([А-ЯЁѢІѲ][а-яёѣіѳ]+(?:[-][А-ЯЁѢІѲ][а-яёѣіѳ]+)?)",
    re.IGNORECASE,
)

SR_INSPECTOR_STD = standardize_text_py("старшій инспекторъ")
SR_FABR_INSPECTOR_STD = standardize_text_py("старшій фабричный инспекторъ")
_NO_DATA_STD = {standardize_text_py("(нет данных)"), standardize_text_py("(нетъ данныхъ)")}
SENIOR_ROLE = "старший инспектор"


def _entity_patterns(dictionary: dict[str, str]) -> list[tuple[str, list[re.Pattern]]]:
    """Longest-first (key, [compiled patterns]) list.  Hyphens match
    [-\\s]?; trailing-dot keys also try the dotless form and vice versa
    (populate_db_ru_v1.py:419-425)."""
    out: list[tuple[str, list[re.Pattern]]] = []
    for key in sorted(dictionary.keys(), key=len, reverse=True):
        if not key:
            continue
        base = re.escape(key)
        if "-" in key:
            base = base.replace(r"\-", r"[-\s]?")
        pats = [r"(?<![а-яё0-9])\b" + base + r"\b(?![а-яё0-9])"]
        if key.endswith("."):
            pats.append(r"(?<![а-яё0-9])\b" + base[:-2] + r"\b(?![а-яё0-9])")
        else:
            pats.append(r"(?<![а-яё0-9])\b" + base + r"\.(?![а-яё0-9])")
        out.append((key, [re.compile(p, re.IGNORECASE) for p in pats]))
    return out


_ENTITY_ORDER: list[tuple[list[tuple[str, list[re.Pattern]]], str]] = [
    (_entity_patterns(KNOWN_PROFESSIONS), "prof_abbr"),
    (_entity_patterns(KNOWN_EDUCATIONS), "edu_abbr"),
    (_entity_patterns(KNOWN_RANKS), "rank_abbr"),
]


def _blank_assignment() -> dict:
    return {
        "name": None,
        "rank_abbr": None,
        "prof_abbr": None,
        "edu_abbr": None,
        "start_date_raw": None,
        "end_date_raw": None,
        "is_vacancy": False,
        "is_acting": False,
        "notes": None,
        "special_role": None,
    }


def _append_note(assignment: dict, text: str, sep: str = "") -> None:
    # keeps the reference's exact concatenation behavior, separators and all
    assignment["notes"] = ((assignment.get("notes") or "") + sep + text).lstrip("; ")


def parse_personnel(raw_html: str | None) -> list[dict]:
    """Python form of U1; contract: populate_db_ru_v1.py:304-501."""
    results: list[dict] = []
    if not raw_html:
        return results

    segments = _BR_RE.sub("||BR||", _html.unescape(raw_html)).split("||BR||")

    for segment_raw in segments:
        segment = segment_raw.strip()
        seg_std_check = standardize_text_py(segment)
        if not segment or segment == "—" or seg_std_check in _NO_DATA_STD:
            continue

        text_original = segment.strip(" ,.")
        if not text_original.strip() or text_original.strip() == "—":
            continue
        std = standardize_text_py(text_original)
        if not std:
            continue

        if std in (SR_INSPECTOR_STD, SR_FABR_INSPECTOR_STD):
            a = _blank_assignment()
            a["special_role"] = SENIOR_ROLE
            results.append(a)
            continue

        a = _blank_assignment()
        text = std

        # parenthesized notes (death sign / cross-references special-cased)
        plain_notes: list[str] = []

        def _note_sub(m: re.Match) -> str:
            content = m.group(1).strip()
            if content == _DEATH:
                _append_note(a, "; Умеръ (†)")
            elif "см. выше" in content or "см. ниже" in content:
                _append_note(a, f"; Ссылка: ({content})")
            else:
                plain_notes.append(content)
            return ""

        text = _NOTE_RE.sub(_note_sub, text).strip(" ,.")
        if plain_notes:
            _append_note(a, "; ".join(plain_notes))

        m_act = _ACTING_RE.search(text)
        if m_act:
            a["is_acting"] = True
            text = text.replace(m_act.group(0), "", 1).strip(" ,.")

        spans: list[tuple[int, int]] = []
        for dm in sorted(_DATE_RE.finditer(text), key=lambda m: m.start()):
            prefix, day, month_raw = dm.group("prefix"), dm.group("day"), dm.group("month")
            month_std = standardize_text_py(month_raw.strip(" .ьъ"))
            date_str = f"{prefix} {day} {month_std}"
            if prefix in ("съ", "с") and not a["start_date_raw"]:
                a["start_date_raw"] = date_str
                spans.append(dm.span())
            elif prefix in ("до", "по") and not a["end_date_raw"]:
                a["end_date_raw"] = date_str
                spans.append(dm.span())
        chars = list(text)
        for s, e in sorted(spans, reverse=True):
            for i in range(s, e):
                chars[i] = ""
        text = "".join(chars).strip(" ,.")

        m_vac = _VACANCY_RE.search(text)
        if m_vac:
            a["is_vacancy"] = True
            a["name"] = "вакансия"
            rest = text.replace(m_vac.group(0), "", 1).strip(" ,.")
            if rest:
                _append_note(a, f"; Доп. о вакансии: {rest}")
            text = ""

        if not a["is_vacancy"]:
            work = text
            m_neim = _NEIM_CHINA_RE.search(work)
            if m_neim:
                _append_note(a, "; Неимѣющій чина")
                work = work.replace(m_neim.group(0), "", 1).strip(" ,.")

            for patterns, field in _ENTITY_ORDER:
                if a[field]:
                    continue
                for key, pats in patterns:
                    matched = False
                    for pat in pats:
                        m = pat.search(work)
                        if m:
                            a[field] = key
                            s, e = m.span()
                            work = (work[:s] + work[e:]).strip(" ,.;")
                            matched = True
                            break
                    if matched:
                        break

            remnant = work.strip(" ,.;")
            if remnant:
                m_name = _NAME_RE.search(remnant)
                if m_name:
                    candidate = next((g for g in m_name.groups() if g is not None), None)
                    if candidate:
                        a["name"] = standardize_text_py(candidate.strip(" ,."))
                        text = remnant.replace(candidate, "", 1).strip(" ,.;")
                    else:
                        text = remnant
                elif (
                    len(remnant.split()) <= 4
                    and len(remnant) > 1
                    and re.search(r"[а-яё]", remnant)
                ):
                    a["name"] = standardize_text_py(remnant)
                    text = ""
                else:
                    text = remnant
            else:
                text = ""

        if (
            not a["name"]
            and not a["is_vacancy"]
            and not a["special_role"]
            and (a["start_date_raw"] or a["end_date_raw"])
        ):
            a["is_vacancy"] = True
            a["name"] = "вакансия (предп. по датам)"

        if text.strip() == _DEATH:
            _append_note(a, "; Умеръ (†)")
            text = ""

        if text:
            prefix = "Доп. инфо"
            if not a["name"] and not a["is_vacancy"] and not a["special_role"]:
                prefix = "Неразобр. остаток"
            note_part = f"{prefix}: {text}"
            if note_part.strip() != prefix + ":":
                _append_note(a, "; " + note_part)

        if a["name"] or a["is_vacancy"] or a["special_role"] == SENIOR_ROLE:
            if a["special_role"] == SENIOR_ROLE and standardize_text_py(a.get("name")) in (
                SR_INSPECTOR_STD,
                SR_FABR_INSPECTOR_STD,
            ):
                a["name"] = None
            results.append(a)

    return results


@pandas_udf(T.ArrayType(ASSIGNMENT_TYPE))
def parse_personnel_udf(personnel_html: pd.Series) -> pd.Series:
    return personnel_html.map(lambda s: parse_personnel(s) if s is not None else [])
