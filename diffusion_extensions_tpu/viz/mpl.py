"""Matplotlib helpers (reference: ``mpl_utils.py``): axis tick formatting in
multiples of pi."""
from __future__ import annotations

import numpy as np

__all__ = ["multiple_formatter", "setup_pi_axis"]


def _gcd(a: int, b: int) -> int:
    while b:
        a, b = b, a % b
    return a


def multiple_formatter(denominator=2, number=np.pi, latex=r"\pi"):
    """Tick formatter rendering multiples of pi as fractions
    (reference: ``mpl_utils.py:8-33``)."""

    def _formatter(x, pos):
        den = denominator
        num = int(np.rint(den * x / number))
        com = _gcd(num, den)
        num, den = int(num / com), int(den / com)
        if den == 1:
            if num == 0:
                return r"$0$"
            if num == 1:
                return r"$%s$" % latex
            if num == -1:
                return r"$-%s$" % latex
            return r"$%s%s$" % (num, latex)
        if num == 1:
            return r"$\frac{%s}{%s}$" % (latex, den)
        if num == -1:
            return r"$-\frac{%s}{%s}$" % (latex, den)
        if num < 0:
            return r"$-\frac{%s%s}{%s}$" % (-num, latex, den)
        return r"$\frac{%s%s}{%s}$" % (num, latex, den)

    return _formatter


def setup_pi_axis(ax, axis="y", major=np.pi / 2, minor=np.pi / 4, denominator=2):
    """Apply pi-multiple locators/formatter to one axis of ``ax``."""
    import matplotlib.pyplot as plt

    a = ax.yaxis if axis == "y" else ax.xaxis
    a.set_major_locator(plt.MultipleLocator(major))
    a.set_minor_locator(plt.MultipleLocator(minor))
    a.set_major_formatter(plt.FuncFormatter(multiple_formatter(denominator)))
