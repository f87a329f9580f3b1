from .normalize import (  # noqa: F401
    BASE_FIELD_IDS,
    REQUIRED_FIELDS,
    AddressRecord,
    InvalidAddressError,
    normalize_frame,
    render_frame,
    validate_frame,
)
