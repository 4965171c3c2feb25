"""Run the reference's own YAML window-case corpus through our kernel.

Each file asserts (a) every compilable case passes, (b) a minimum
supported count so coverage only ratchets up. SKIPPED cases are shapes
outside the harness's SQL subset (multi-window, expressions, union
sub-selects) — printed with -rs for audit.
"""

import pytest

from yaml_harness import Unsupported, check_case, load_cases

FILES = {
    # fname: minimum number of cases that must compile & pass
    "test_window_row.yaml": 25,
    "test_window_row_range.yaml": 45,
    "test_maxsize.yaml": 22,
    "test_window_exclude_current_time.yaml": 18,
    "test_window_union.yaml": 8,
    "test_window.yaml": 51,   # dataProvider-expanded ROWS/ROWS_RANGE variants
}


def _cases():
    out = []
    for fname in FILES:
        for case in load_cases(fname):
            out.append(pytest.param(
                fname, case, id=f"{fname}::{case.get('id')}"))
    return out


@pytest.mark.parametrize("fname,case", _cases())
def test_reference_case(fname, case):
    if case.get("mode") and "batch-unsupport" in str(case["mode"]):
        pytest.skip("case marked batch-unsupported in the reference")
    if "expect" in case and case["expect"].get("success") is False:
        pytest.skip("negative (error) case")
    try:
        check_case(case)
    except Unsupported as e:
        pytest.skip(f"outside harness SQL subset: {e}")


@pytest.mark.parametrize("fname", sorted(FILES))
def test_minimum_supported_coverage(fname):
    ok = 0
    failures = []
    for case in load_cases(fname):
        if case.get("mode") and "batch-unsupport" in str(case["mode"]):
            continue
        if "expect" in case and case["expect"].get("success") is False:
            continue
        try:
            check_case(case)
            ok += 1
        except Unsupported:
            pass
        except AssertionError as e:  # pragma: no cover
            failures.append((case.get("id"), str(e)[:200]))
    assert not failures, failures
    assert ok >= FILES[fname], f"{fname}: only {ok} supported cases"
