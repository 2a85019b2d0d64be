"""Unit tests for the UAX-35 pattern compilers.

The number-pattern table is ported from the reference's spec
(rdf-tabular spec/metadata_spec.rb:1400-1491 "Number formats"); the date
cases from spec/uax35_spec.rb. These pin behavioral parity of the
driver-side compilers (valid/invalid acceptance + normalized lexical form).
"""

from __future__ import annotations

import re

import pytest

from rdf_tabular_spark.csvw.uax35 import (
    PatternError,
    build_number_regex,
    compile_date_pattern,
    compile_number_pattern,
    normalize_date,
    normalize_number,
)

NUMBER_CASES = {
    "0": (["1", "-1", "+1", "12"], ["1.2"]),
    "00": (["12", "123"], ["1", "1,2"]),
    "#": (["1", "12", "123"], ["1.2"]),
    "0.0": (["1.1", "-1.1", "12.1"], ["1.12"]),
    "0.00": (["1.12", "+1.12", "12.12"], ["1.1", "1.123"]),
    "0.#": (["1", "1.1", "12.1"], ["1.12"]),
    "-0": (["-1", "-10"], ["1", "+1"]),
    "%000": (["%123", "%+123", "%-123", "%1234"], ["%12", "123%"]),
    "‰000": (["‰123", "‰+123", "‰-123", "‰1234"], ["‰12", "123‰"]),
    "000%": (["123%", "+123%", "-123%", "1234%"], ["12%", "%123"]),
    "000‰": (["123‰", "+123‰", "-123‰", "1234‰"], ["12‰", "‰123"]),
    "###0.#####": (["1", "1.1", "12345.12345"], ["1,234.1", "1.123456"]),
    "###0.0000#": (["1.1234", "1.12345", "12345.12345"], ["1,234.1234", "1.12"]),
    "00000.0000": (["12345.1234"], ["1.2", "1,234.123,4"]),
    "##0": (["1", "12", "123", "1234"], ["1,234", "123.4"]),
    "#,#00": (["12", "123", "1,234", "1,234,567"],
              ["1", "1234", "12,34", "12,34,567"]),
    "#0.#": (["1", "1.2", "1234.5"], ["12.34", "1,234.5"]),
    "#0.0#,#": (["12.3", "12.34", "12.34,5"],
                ["1", "12.345", "12.34,56,7", "12.34,567"]),
}


@pytest.mark.parametrize("pattern", sorted(NUMBER_CASES))
def test_number_pattern_acceptance(pattern):
    valid, invalid = NUMBER_CASES[pattern]
    plan = compile_number_pattern(pattern)
    for v in valid:
        assert normalize_number(v, plan) is not None, f"{v!r} should match {pattern!r}"
    for v in invalid:
        assert normalize_number(v, plan) is None, f"{v!r} should NOT match {pattern!r}"


GROUPING_PATTERNS = [
    "#,##,##0", "#,##,#00", "#,##,000", "#,#0,000", "#,00,000", "0,00,000",
    "0.0##,###", "0.00#,###", "0.000,###", "0.000,0##", "0.000,00#",
    "0.000,000", "#0.0#E#0", "#0.0#E+#0", "#0.0#E#0%",
]


@pytest.mark.parametrize("pattern", GROUPING_PATTERNS)
def test_number_pattern_compiles(pattern):
    # regexes must compile in both Python (driver) and be Java-safe (no
    # named groups / lookbehind) for executor-side rlike
    regex = build_number_regex(pattern)
    re.compile(regex)
    assert "(?P<" not in regex and "(?<" not in regex


def test_grouping_acceptance_spot_checks():
    plan = compile_number_pattern("#,##,##0")  # indian-style grouping
    assert normalize_number("1,23,45,678", plan) == "12345678"
    assert normalize_number("12345678", plan) is None  # grouping required? no:
    # '#,##,##0' admits bare single digit but grouped longer forms
    assert normalize_number("1", plan) == "1"

    plan = compile_number_pattern("#,#00")
    assert normalize_number("1,234,567", plan) == "1234567"
    assert normalize_number("1234", plan) is None

    plan = compile_number_pattern("#0.0#E#0")
    assert normalize_number("12.34E5", plan) == "12.34e5"


def test_number_normalization_lexical_forms():
    plan = compile_number_pattern(None)  # default pattern
    assert normalize_number("1,234.5", plan) == "1234.5"
    assert normalize_number("NAN", plan) == "NaN"
    assert normalize_number("INF", plan) == "INF"
    assert normalize_number("-INF", plan) == "-INF"
    assert normalize_number("1.2E3", plan) == "1.2e3"
    # percent / per-mille decimal shifts (reference uax35.rb:203-252)
    assert normalize_number("123%", plan) == "1.23"
    assert normalize_number("1%", plan) == "0.01"
    assert normalize_number("12.5%", plan) == "0.125"
    assert normalize_number("1234%", plan) == "12.34"
    assert normalize_number("123‰", plan) == "0.123"
    assert normalize_number("1‰", plan) == "0.001"
    assert normalize_number("12345‰", plan) == "12.345"
    # repeated group char is always invalid
    assert normalize_number("1,,234", plan) is None


def test_bad_number_patterns():
    for bad in ["a", "%"]:
        with pytest.raises(PatternError):
            build_number_regex(bad)


DATE_CASES = [
    ("yyyy-MM-dd", "2015-03-22", "2015-03-22"),
    ("yyyyMMdd", "20150322", "2015-03-22"),
    ("dd-MM-yyyy", "22-03-2015", "2015-03-22"),
    ("d-M-yyyy", "22-3-2015", "2015-03-22"),
    ("MM-dd-yyyy", "03-22-2015", "2015-03-22"),
    ("M-d-yyyy", "3-22-2015", "2015-03-22"),
    ("dd/MM/yyyy", "22/03/2015", "2015-03-22"),
    ("d/M/yyyy", "22/3/2015", "2015-03-22"),
    ("MM/dd/yyyy", "03/22/2015", "2015-03-22"),
    ("M/d/yyyy", "3/22/2015", "2015-03-22"),
    ("dd.MM.yyyy", "22.03.2015", "2015-03-22"),
    ("d.M.yyyy", "22.3.2015", "2015-03-22"),
    ("MM.dd.yyyy", "03.22.2015", "2015-03-22"),
    ("M.d.yyyy", "3.22.2015", "2015-03-22"),
    ("M/d/yyyy", "10/18/2010", "2010-10-18"),  # tree-ops fixture
    ("M/d/yyyy", "6/2/2010", "2010-06-02"),
    # two-digit-year windowing (uax35.rb:160-168)
    ("d/M/yy", "22/3/15", "2015-03-22"),
    ("d/M/yy", "22/3/85", "1985-03-22"),
    ("d/M/y", "22/3/5", "2005-03-22"),
    # times
    ("HH:mm:ss", "15:02:37", "15:02:37"),
    ("HHmmss", "150237", "15:02:37"),
    ("HH:mm", "15:02", "15:02:00"),
    ("HHmm", "1502", "15:02:00"),
    ("HH:mm:ss.SSS", "15:02:37.143", "15:02:37.143"),
    ("HH:mm:ss.SSS", "15:02:37.1", "15:02:37.1"),
    # datetimes
    ("yyyy-MM-ddTHH:mm:ss", "2015-03-15T15:02:37", "2015-03-15T15:02:37"),
    ("yyyy-MM-ddTHH:mm", "2015-03-15T15:02", "2015-03-15T15:02:00"),
    ("yyyy-MM-dd HH:mm:ss", "2015-03-15 15:02:37", "2015-03-15T15:02:37"),
    ("yyyy-MM-ddTHH:mm:ss.S", "2015-03-15T15:02:37.1", "2015-03-15T15:02:37.1"),
    # timezones
    ("yyyy-MM-ddTHH:mm:ssX", "2015-03-15T15:02:37Z", "2015-03-15T15:02:37Z"),
    ("yyyy-MM-ddTHH:mm:ssXXX", "2015-03-15T15:02:37-05:00",
     "2015-03-15T15:02:37-05:00"),
    ("yyyy-MM-dd HH:mm:ss x", "2015-03-15 15:02:37 -05",
     "2015-03-15T15:02:37-05:00"),
]


@pytest.mark.parametrize("pattern,value,expected", DATE_CASES)
def test_date_patterns(pattern, value, expected):
    plan = compile_date_pattern(pattern)
    assert normalize_date(value, plan) == expected


def test_date_rejections():
    plan = compile_date_pattern("yyyy-MM-dd")
    assert normalize_date("22-03-2015", plan) is None
    assert normalize_date("2015-3-22", plan) is None
    plan = compile_date_pattern("M/d/yyyy")
    assert normalize_date("2010-10-18", plan) is None
    with pytest.raises(PatternError):
        compile_date_pattern("yyyy-MM-qq")
