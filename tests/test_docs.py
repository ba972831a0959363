"""Doc hygiene: the README must not carry stale test counts (round-3
verdict: three different stale numbers in the front door doc). Instead of
chasing an exact number, the README states none — this test enforces
that, and sanity-checks the marker split still exists."""
import re
from pathlib import Path

import pytest

README = Path(__file__).resolve().parent.parent / "README.md"


@pytest.mark.quick
def test_readme_has_no_hard_test_counts():
    text = README.read_text()
    # "N tests" / "N quick" style hard counts go stale; ranges like
    # "180+ tests" are allowed
    stale = re.findall(r"(?<![\d+])\b(\d{2,4}) (?:tests|quick tests)\b",
                       text)
    assert not stale, f"hard test counts in README: {stale}"


@pytest.mark.quick
def test_readme_marker_commands_match_pytest_ini():
    text = README.read_text()
    ini = (README.parent / "pytest.ini").read_text()
    assert "slow" in ini and "quick" in ini
    assert '-m "not slow"' in text or "-m quick" in text
