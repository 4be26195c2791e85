"""Unit <-> printable-unicode mapping.

Parity with /root/reference/src/speechlm/utils.py:28-46: units map to
printable characters, skipping C0 controls + space (0-32), DEL + C1 controls
+ NBSP (127-160).
"""

from __future__ import annotations

from typing import List, Sequence


def shift_unit(unit: int) -> int:
    """unit id -> unicode code point (utils.py:28-39 semantics)."""
    if unit < 94:
        return unit + 33  # printable ASCII 33..126
    return unit + 67  # 161..


def unshift_unit(code_point: int) -> int:
    """inverse mapping: code point -> unit id."""
    if 33 <= code_point <= 126:
        return code_point - 33
    if code_point >= 161:
        return code_point - 67
    raise ValueError(f"code point {code_point} is not a shifted unit")


def units_to_unicode(units: Sequence[int]) -> str:
    """unit id sequence -> printable string (utils.py:42-46 parity)."""
    return "".join(chr(shift_unit(int(u))) for u in units)


def unicode_to_units(s: str) -> List[int]:
    return [unshift_unit(ord(c)) for c in s]


# reference-name aliases
convert_units_to_unicode = units_to_unicode
