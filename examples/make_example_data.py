#!/usr/bin/env python
"""Generate the example dataset (the reference example/data_sim.R workflow,
example/data_sim.R:1-80, without requiring R or plink).

N=10,000 individuals x M=20,000 markers, Binomial(2, 0.4) genotypes,
h2=0.5 over 5,000 causal markers, two phenotypes, plus the NA-containing
and duplicate phenotype variants used by the reference smoke tests
(example/part1_gcc_mvapich2.sh:16-27).
"""

import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmrm_tpu.io.sim import simulate


def main(out_dir="examples/data"):
    sim = simulate(
        out_dir, n=10_000, m=20_000, n_traits=2, n_causal=5_000, h2=0.5,
        n_groups=1, na_rate=0.0, seed=171014,
        mixtures=np.array([0.0, 0.0001, 0.001, 0.01]),
    )
    # test1_bis: exact duplicate (reference example/test1_bis.phen).
    shutil.copy(sim.phens[0], os.path.join(out_dir, "test1_bis.phen"))
    # test1_nas: same phenotype with one NA injected (reference
    # example/test1_nas.phen has an NA at line 9).
    with open(sim.phens[0]) as fh:
        lines = fh.readlines()
    toks = lines[8].split()
    lines[8] = f"{toks[0]} {toks[1]} NA\n"
    with open(os.path.join(out_dir, "test1_nas.phen"), "w") as fh:
        fh.writelines(lines)
    print(f"example data written to {out_dir}")


if __name__ == "__main__":
    main(*sys.argv[1:])
