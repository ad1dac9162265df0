"""Generate byte-golden covariate-adjusted trace fixtures BY HAND.

These files are constructed directly from Armadillo's diskio byte layout —
NOT via bayesfmmm_tpu.io.armaio — so the loader tests in
tests/test_covadj_golden.py verify interop against the format the reference
would produce, independent of this repo's writer (round-2 VERDICT missing
#3).

Layout facts, each verified against reference-produced files in
/root/reference/inst/test-data (Functional_trace/Phi0.txt, fieldmat.txt):

  * field binary:  b"ARMA_FLD_BIN\\n{n_rows}\\n{n_cols}\\n" then each element
    in FIELD-COLUMN-MAJOR order (all rows of column 0 first).
  * cube binary element: b"ARMA_CUB_BIN_FN008\\n{r} {c} {s}\\n" + float64
    little-endian, column-major within slice, slices sequential.
  * cube ascii: b"ARMA_CUB_TXT_FN008\\n{r} {c} {s}\\n" + one text row per
    cube row per slice (slices sequential), Armadillo print order.

Container shapes (BFMMM.h:4472-4474, :5102-5107; README.md:80-98):
  Eta{q}:      field<cube>(iters, 1), cube (P, D, K)
  Tau_Eta{q}:  cube (K, D, iters), arma_ascii
  Xi{q}:       field<cube>(iters, K), cube (P, D, M)
  Gamma_Xi{q}: field<cube>(iters, K), cube (P, D, M)
  Delta_Xi{q}: field<cube>(iters, 1), cube (K, M, D)
  A_Xi{q}:     field<cube>(iters, 1), cube (K, 2, D)

Cell values encode their own multi-index so any element-order or
slice-order mistake in the loader produces a loud mismatch:
  value = iter*1e5 + k*1e4 + a*100 + b*10 + c   (a,b,c = remaining axes).
"""

import os

import numpy as np

IT, K, P, D, M = 3, 2, 4, 2, 3
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "covadj_golden")


def cube_bin(arr_rcs):
    """arr_rcs: (r, c, s) ndarray -> ARMA_CUB_BIN bytes (column-major)."""
    r, c, s = arr_rcs.shape
    head = f"ARMA_CUB_BIN_FN008\n{r} {c} {s}\n".encode()
    payload = b"".join(
        arr_rcs[:, :, k].astype("<f8").tobytes(order="F") for k in range(s))
    return head + payload


def cube_ascii(arr_rcs):
    r, c, s = arr_rcs.shape
    lines = [f"ARMA_CUB_TXT_FN008", f"{r} {c} {s}"]
    for k in range(s):
        for i in range(r):
            lines.append(" ".join(f"{arr_rcs[i, j, k]:.10e}"
                                  for j in range(c)))
    return ("\n".join(lines) + "\n").encode()


def field_bin(elems, n_rows, n_cols):
    """elems: list of (r,c,s) cubes in FIELD-COLUMN-MAJOR order."""
    head = f"ARMA_FLD_BIN\n{n_rows}\n{n_cols}\n".encode()
    return head + b"".join(cube_bin(e) for e in elems)


def val(it, k, a, b, c):
    return float(it) * 1e5 + float(k) * 1e4 + float(a) * 100 \
        + float(b) * 10 + float(c)


def main():
    os.makedirs(OUT, exist_ok=True)

    # Eta: field (IT, 1) of (P, D, K) cubes; axes (p, d, k)
    eta_elems = []
    for it in range(IT):
        cube = np.zeros((P, D, K))
        for p in range(P):
            for d in range(D):
                for k in range(K):
                    cube[p, d, k] = val(it, k, p, d, 0)
        eta_elems.append(cube)
    open(os.path.join(OUT, "Eta0.txt"), "wb").write(
        field_bin(eta_elems, IT, 1))

    # Tau_Eta: ascii cube (K, D, IT)
    te = np.zeros((K, D, IT))
    for k in range(K):
        for d in range(D):
            for it in range(IT):
                te[k, d, it] = val(it, k, 0, d, 0)
    open(os.path.join(OUT, "Tau_Eta0.txt"), "wb").write(cube_ascii(te))

    # Xi / Gamma_Xi: field (IT, K) of (P, D, M) cubes, field-column-major
    # element order: (it=0,k=0), (it=1,k=0), ..., then k=1 column.
    for stem in ("Xi", "Gamma_Xi"):
        elems = []
        for k in range(K):
            for it in range(IT):
                cube = np.zeros((P, D, M))
                for p in range(P):
                    for d in range(D):
                        for m in range(M):
                            cube[p, d, m] = val(it, k, p, d, m)
                elems.append(cube)
        open(os.path.join(OUT, f"{stem}0.txt"), "wb").write(
            field_bin(elems, IT, K))

    # Delta_Xi: field (IT, 1) of (K, M, D); A_Xi: field (IT, 1) of (K, 2, D)
    for stem, mid in (("Delta_Xi", M), ("A_Xi", 2)):
        elems = []
        for it in range(IT):
            cube = np.zeros((K, mid, D))
            for k in range(K):
                for x in range(mid):
                    for d in range(D):
                        cube[k, x, d] = val(it, k, x, d, 0)
            elems.append(cube)
        open(os.path.join(OUT, f"{stem}0.txt"), "wb").write(
            field_bin(elems, IT, 1))
    print("wrote", sorted(os.listdir(OUT)))


if __name__ == "__main__":
    main()
