"""Print the GD 1D basis coefficient tables in the reference's C++
nested-brace format (parity with reference scripts/create_coefficients.py,
but derived from gdm.basis's exact-rational Lagrange construction instead
of sympy).

Usage: python scripts/create_coefficients.py <odd degree>
"""

import sys
from fractions import Fraction

sys.path.insert(0, ".")
from gdm.basis import category_coefficients_exact  # noqa: E402


def main():
    deg = int(sys.argv[1])
    assert deg % 2 == 1
    for cat in range(deg):
        rows = []
        for m in range(deg + 1):
            coeffs = category_coefficients_exact(deg, cat)[m]
            desc = list(coeffs)[::-1]  # descending powers like fe.h
            rows.append(
                "            {{"
                + ", ".join(
                    f"{float(c.numerator):.1f} / {float(c.denominator):.1f}"
                    for c in desc
                )
                + "}}"
            )
        print("          {{\n" + ",\n".join(rows) + "\n          }},")


if __name__ == "__main__":
    main()
