"""CLI flag-surface parity with the reference (SURVEY C1).

The r2 verdict verified "all 50 reference flag names present" by regex-
diffing our Config against the reference's absl DEFINE calls; this test
makes that check permanent.  Skips when the reference tree is absent
(CI without /root/reference).
"""

import dataclasses
import os
import re

import pytest

from simclr_tpu.config import Config

_REF = "/root/reference"

# Reference flags that are intentionally renamed/absorbed here (documented
# in config.py help text / docs/PARITY.md).
_RENAMES = {
    "data_dir": "data_dir",
}


def _reference_flag_names():
    names = set()
    for rel in ("run.py", "tf2/run.py"):
        path = os.path.join(_REF, rel)
        with open(path) as f:
            src = f.read()
        names.update(re.findall(
            r"flags\.DEFINE_\w+\(\s*['\"](\w+)['\"]", src))
    return names


@pytest.mark.skipif(not os.path.isdir(_REF), reason="reference tree absent")
def test_all_reference_flags_have_a_config_field():
    ref = _reference_flag_names()
    assert len(ref) >= 45, f"unexpectedly few reference flags parsed: {len(ref)}"
    ours = {f.name for f in dataclasses.fields(Config)}
    missing = sorted(n for n in ref if _RENAMES.get(n, n) not in ours)
    assert not missing, f"reference flags without a Config field: {missing}"
