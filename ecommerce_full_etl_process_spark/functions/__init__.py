from .dates import (  # noqa: F401
    calendar_attrs,
    date_id,
    iso_week,
    iso_weekday,
    parse_date_multi,
)
from .text import EMAIL_PATTERN, is_blank, is_valid_email, norm_lower  # noqa: F401

__all__ = [
    "calendar_attrs", "date_id", "iso_week", "iso_weekday",
    "parse_date_multi",
    "EMAIL_PATTERN", "is_blank", "is_valid_email", "norm_lower",
]
