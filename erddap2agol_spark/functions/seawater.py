"""Seawater density at atmospheric pressure — EOS-80 rho(S, T, 0).

The one-atmosphere International Equation of State of Seawater
(UNESCO/Fofonoff & Millard 1983): the derived variable every ocean-
observing consumer computes from a temperature+salinity grid (the
reference serves exactly such grids; its griddap datasets carry
water_temp/salinity variables).

Cross-engine float discipline: ONE builder constructs the arithmetic for
both engines — :func:`sigma_t` emits the PySpark Column and
:func:`sigma_t_sql` emits the DuckDB SQL — from the same coefficient
table, with identical association (Horner in T, integer powers as
multiplication chains, ``S**1.5`` as ``sqrt(S)*S`` since IEEE sqrt and
multiply are correctly rounded while ``pow`` need not be). Identical
expression trees over identical doubles give identical results; outputs
still round at the query layer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: rho_w(T): pure-water density, Horner coefficients (highest first)
_RHO_W = (
    6.536332e-9,
    -1.120083e-6,
    1.001685e-4,
    -9.095290e-3,
    6.793952e-2,
    999.842594,
)
#: A(T): linear-salinity coefficient
_A = (5.3875e-9, -8.2467e-7, 7.6438e-5, -4.0899e-3, 8.24493e-1)
#: B(T): S^1.5 coefficient
_B = (-1.6546e-6, 1.0227e-4, -5.72466e-3)
#: C: S^2 coefficient
_C = 4.8314e-4


def _horner_col(t: Column, coeffs: tuple[float, ...]) -> Column:
    acc: Column = F.lit(coeffs[0])
    for c in coeffs[1:]:
        acc = acc * t + F.lit(c)
    return acc


def _horner_sql(t: str, coeffs: tuple[float, ...]) -> str:
    acc = repr(coeffs[0])
    for c in coeffs[1:]:
        acc = f"({acc} * {t} + {c!r})"
    return acc


def sigma_t(t: Column, s: Column) -> Column:
    """sigma-t = rho(S, T, 0) - 1000 [kg/m^3], EOS-80."""
    rho_w = _horner_col(t, _RHO_W)
    a = _horner_col(t, _A)
    b = _horner_col(t, _B)
    s15 = F.sqrt(s) * s
    return rho_w + a * s + b * s15 + F.lit(_C) * (s * s) - F.lit(1000.0)


def sigma_t_sql(t: str, s: str) -> str:
    """The SAME expression as :func:`sigma_t`, as DuckDB SQL text."""
    rho_w = _horner_sql(t, _RHO_W)
    a = _horner_sql(t, _A)
    b = _horner_sql(t, _B)
    return (
        f"({rho_w} + {a} * {s} + {b} * (sqrt({s}) * {s})"
        f" + {_C!r} * ({s} * {s}) - 1000.0)"
    )
