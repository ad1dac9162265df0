"""Use the reference-named API on the reference package's own fixtures.

Demonstrates drop-in familiarity for BayesFMMM users: same function names,
same trace-directory conventions (works on directories produced by either
implementation).
"""

import numpy as np

from bayesfmmm_tpu import reference_api as R
from bayesfmmm_tpu.io.rds import read_rds

DIR = "/root/reference/inst/test-data/Functional_trace/"
REF = "/root/reference/inst/test-data"


def main():
    t = np.linspace(0, 990, 50)
    ci = R.FMeanCI(DIR, 1, t, 3, [0, 1000], [250, 500, 750], k=1)
    print("FMeanCI median range:",
          round(ci["CI_50"].min(), 2), "..", round(ci["CI_50"].max(), 2))

    Y = read_rds(f"{REF}/Sim_data.RDS")
    T = read_rds(f"{REF}/time.RDS")
    print("FDIC:", R.FDIC(DIR, 1, 3, [0, 1000], [250, 500, 750], T, Y))
    print("FBIC:", R.FBIC(DIR, 1, 3, [0, 1000], [250, 500, 750], T, Y))
    cpo = R.ConditionalPredictiveOrdinates(
        DIR, 1, 3, [0, 1000], [250, 500, 750], T, Y, burnin_prop=0.5)
    print("CPO (first 5):", cpo[:5].round(2))


if __name__ == "__main__":
    main()
