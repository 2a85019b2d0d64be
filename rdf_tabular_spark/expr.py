"""Shared column-expression helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_(val: Column, body) -> Column:
    """Expression-level ``let``: materialize *val* ONCE and hand it to
    *body* as a higher-order-lambda argument. Interpreted HOF lambdas
    have no common-subexpression elimination — every reference to a
    Column re-evaluates its whole subtree — but a lambda ARGUMENT is a
    materialized value, so wrapping an expensive subtree in a
    single-element transform makes N references cost one evaluation
    (measured ~20x on the UAX-35 number typing path, where the
    normalize tree was re-run for the validity flag, the lexical check,
    each bounds check, each error message, and the output struct)."""
    return F.element_at(F.transform(F.array(val), body), 1)
