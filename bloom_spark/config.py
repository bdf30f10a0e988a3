"""Size/limit parsing with SI units — reference H6 parity.

The reference CLI parses every NUM/SIZE argument (``-xls``, ``-bls``,
``-ble`` first field) with the ``parse-size`` crate v1.0 (reference:
Cargo.toml:16, src/main.rs:21,182-191,216-224,250-253): decimal
``K/M/G/T`` multiply by powers of 1000, binary ``KiB/MiB/GiB/TiB`` by
powers of 1024, suffixes are case-insensitive, a trailing ``b``/``B`` is
optional, whitespace between number and unit is allowed, and fractional
values are truncated after scaling ("1.5K" → 1500). So the reference's
default ``size="2Gb"`` is 2,000,000,000 bytes and ``limit="200M"`` is
200,000,000 lines (src/main.rs:339-342).
"""

from __future__ import annotations

import re

_DECIMAL = {"": 1, "k": 10**3, "m": 10**6, "g": 10**9, "t": 10**12, "p": 10**15}
_BINARY = {"k": 2**10, "m": 2**20, "g": 2**30, "t": 2**40, "p": 2**50}

_SIZE_RE = re.compile(
    r"^\s*(?P<num>\d+(?:\.\d+)?)\s*(?P<unit>[kmgtp]?)(?P<bin>i?)(?:b)?\s*$",
    re.IGNORECASE,
)

# The reference CLI's no-args defaults (src/main.rs:339-342): one XXH
# container capped at 200M lines in a 2 GB (decimal) bit vector.
DEFAULT_LIMIT = "200M"
DEFAULT_SIZE = "2Gb"


def parse_size(value: int | float | str) -> int:
    """``"2Gb"`` → 2_000_000_000; ``"100MiB"`` → 104_857_600; ints pass
    through. Raises ValueError on anything else (the reference exits
    with a parse error, src/main.rs:182-191)."""
    if isinstance(value, bool):
        raise ValueError(f"not a size: {value!r}")
    if isinstance(value, int):
        return value
    if isinstance(value, float):
        return int(value)
    m = _SIZE_RE.match(str(value))
    if not m:
        raise ValueError(f"could not parse size {value!r}")
    num_s = m.group("num")
    unit = m.group("unit").lower()
    if m.group("bin"):
        if not unit:
            raise ValueError(f"could not parse size {value!r}")
        mult = _BINARY[unit]
    else:
        mult = _DECIMAL[unit]
    if "." in num_s:
        return int(float(num_s) * mult)
    # exact integer arithmetic — float would lose precision past 2^53
    return int(num_s) * mult
