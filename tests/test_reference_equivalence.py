"""MCMC equivalence against the COMPILED reference gmrm binary.

Gated by GMRM_TEST_REFERENCE=1 (builds and runs the reference via
baseline/Makefile and a ~400-iteration chain of our sampler — minutes on
CPU).  The ungated fast equivalence coverage lives in
tests/test_sweep_equivalence.py (vs the NumPy port-of-record oracle);
this test closes the loop against the actual C++ program's output chains
(.csv h2 trajectory, .bet posterior means — src/xfiles.cpp:17-43,
src/xfiles.hpp:13-38).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("GMRM_TEST_REFERENCE") != "1",
    reason="set GMRM_TEST_REFERENCE=1 to run the compiled-reference "
           "equivalence check (slow; builds the C++ reference)",
)
def test_chains_match_compiled_reference():
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "benchmarking", "equivalence_ref.py"),
         "--quick"],
        capture_output=True, text=True, timeout=3000,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
