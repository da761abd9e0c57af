"""Column-name mangling and the reference's path mini-language.

The reference names a flattened column by PascalCasing each JSON key segment
(first character uppercased only — NOT ``initcap``) and joining segments
with ``_``; array indices appear as bare digit segments
(reference: ``ElasticSearch ETL.py:23-27,49-51,61-65``). Extraction then
*re-parses* the column name by splitting on ``_`` and resolving each segment
against the document with four case variants
(``ElasticSearch ETL.py:84,96-110``). That round-trip loses data for digit
map keys (quirk Q1) and keys containing underscores (quirk Q2).

Our plan generator never round-trips through strings — it walks the Spark
schema and emits resolved ``Column`` expressions directly — but
``resolve_reference_path`` simulates the reference parser *against the
schema at plan time* so ``bug_compat=True`` reproduces Q1/Q2 byte-for-byte.
"""

from __future__ import annotations

from typing import Optional


def to_pascal_case(s: str) -> str:
    """First char uppercased, rest preserved (reference ``ElasticSearch ETL.py:23-27``)."""
    if not s:
        return s
    return s[0].upper() + s[1:] if len(s) > 1 else s.upper()


def to_camel_case(s: str) -> str:
    """First char lowercased, rest preserved (reference ``ElasticSearch ETL.py:30-34``)."""
    if not s:
        return s
    return s[0].lower() + s[1:] if len(s) > 1 else s.lower()


def key_variants(part: str) -> list[str]:
    """Lookup variants the reference tries, in order (``ElasticSearch ETL.py:108-110``)."""
    return [to_camel_case(part), part.lower(), part, part.capitalize()]


def resolve_reference_path(
    node: object, column_name: str, sep: str = "_"
) -> Optional[list[object]]:
    """Simulate the reference's name→path parser against a schema tree.

    ``node`` is a plan-time schema tree: dicts map field name → child node,
    lists are single-element ``[child]`` array markers, and anything else is
    a leaf. Returns the resolved path as a list of steps (``str`` field name
    or ``int`` array index), or ``None`` when the reference parser would
    miss and emit the default ``''`` (quirks Q1/Q2,
    ``ElasticSearch ETL.py:79-129``).
    """
    parts = column_name.split(sep)
    path: list[object] = []
    current = node
    for part in parts:
        if not part:
            continue
        if part.isdigit():
            # Digit segment indexes an array; against a dict it misses (Q1).
            if isinstance(current, list):
                path.append(int(part))
                current = current[0]
                continue
            return None
        if isinstance(current, dict):
            for key in key_variants(part):
                if key in current:
                    path.append(key)
                    current = current[key]
                    break
            else:
                return None
        else:
            # Array without an index, or primitive before path end.
            return None
    return path
