from .scalar import (
    coalesce_default,
    date_parts,
    decompose_date,
    json_path,
    parse_unit_suffixed,
    safe_cast,
    today_parts,
)

__all__ = [
    "coalesce_default",
    "date_parts",
    "decompose_date",
    "json_path",
    "parse_unit_suffixed",
    "safe_cast",
    "today_parts",
]
