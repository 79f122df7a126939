"""Java/Scala ``Double.toString`` compatible formatting.

The reference emits scores via Scala's Double.toString (e.g.
Doench2014OnTarget.scala:62, CRISPRSiteOT annotations), whose format differs
from Python's repr: decimal notation only for 1e-3 <= |x| < 1e7, otherwise
"computerized scientific notation" like ``1.0E-4`` / ``1.2345E7``; always at
least one fractional digit. The shortest-round-trip digit selection matches
Python's repr, so we re-render repr's digits under Java's layout rules.
"""

from __future__ import annotations

import math


def java_double_to_string(x: float) -> str:
    x = float(x)
    # fast path: Java uses plain decimal for 1e-3 <= |x| < 1e7, and Python's
    # repr is already in that layout there (repr switches to scientific only
    # below 1e-4 or at/above 1e16), so the digit strings coincide
    if 0.001 <= x < 1e7:
        return repr(x)
    if -1e7 < x <= -0.001:
        return repr(x)
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "Infinity" if x > 0 else "-Infinity"
    sign = "-" if (x < 0 or (x == 0 and math.copysign(1.0, x) < 0)) else ""
    if x == 0:
        return sign + "0.0"

    r = repr(abs(x))
    # parse repr into digit string + exponent of the leading digit
    if "e" in r or "E" in r:
        mant, exp_s = r.lower().split("e")
        exp = int(exp_s)
        if "." in mant:
            int_part, frac_part = mant.split(".")
        else:
            int_part, frac_part = mant, ""
        digits = (int_part + frac_part).lstrip("0")
        lead_exp = exp + len(int_part.lstrip("0")) - 1
    else:
        if "." in r:
            int_part, frac_part = r.split(".")
        else:
            int_part, frac_part = r, ""
        stripped = (int_part + frac_part).lstrip("0")
        if int_part.lstrip("0"):
            lead_exp = len(int_part.lstrip("0")) - 1
        else:
            # 0.00ddd — count zeros after the decimal point
            zeros = len(frac_part) - len(frac_part.lstrip("0"))
            lead_exp = -(zeros + 1)
        digits = stripped
    digits = digits.rstrip("0") or "0"

    if -3 <= lead_exp <= 6:
        if lead_exp >= 0:
            int_digits = digits[: lead_exp + 1].ljust(lead_exp + 1, "0")
            frac_digits = digits[lead_exp + 1:] or "0"
            return sign + int_digits + "." + frac_digits
        return sign + "0." + "0" * (-lead_exp - 1) + digits
    frac = digits[1:] or "0"
    return sign + digits[0] + "." + frac + "E" + str(lead_exp)


def java_int_or_double(x) -> str:
    """Render ints as ints, floats Java-style."""
    if isinstance(x, int):
        return str(x)
    return java_double_to_string(x)
