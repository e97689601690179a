"""NumPy transcription of the reference tfQMR loop (tfqmrgpu_core.hxx:179-306
plus the decision kernels in tfqmrgpu_linalg.hxx) used as a trajectory oracle
for the JAX solver.  Keeps the reference's precision model: block data in
``dtype`` (float32/float64), reductions and scalar decisions in float64."""

import numpy as np

EPSILON = 2.5e-308


class Oracle:
    def __init__(self, plan, a_blocks, b_blocks, lm, ln, dtype=np.float64,
                 v3=None, seed=1234):
        self.plan = plan
        self.lm, self.ln = lm, ln
        self.dtype = dtype
        self.cdtype = np.complex128 if dtype == np.float64 else np.complex64
        self.a = a_blocks.astype(self.cdtype)          # [nnzbA, LM, LM] complex
        self.b = b_blocks.astype(self.cdtype)          # [nnzbB, LM, LN]
        self.colindx = plan.colindx.astype(np.int64)
        self.subset = plan.subset.astype(np.int64)
        self.ncols = plan.ncols
        nx = plan.nnzb_x
        if v3 is None:
            r = np.random.default_rng(seed)
            v3 = (r.random((nx, lm, ln)) + 1j * r.random((nx, lm, ln)))
        self.v3 = v3.astype(np.complex64)

    def mult(self, x):
        y = np.zeros_like(x)
        p = self.plan
        for iy in range(p.nnzb_x):
            for ip in range(p.starts[iy], p.starts[iy + 1]):
                ia, ix = p.pairs[ip]
                y[iy] += (self.a[ia] @ x[ix]).astype(self.cdtype)
        return y

    def dotp(self, x, y):
        z = np.zeros((self.ncols, self.ln), np.complex128)
        part = (x * y).astype(self.cdtype).sum(axis=1)  # unconjugated
        for inz in range(x.shape[0]):
            z[self.colindx[inz]] += part[inz]
        return z

    def nrm2(self, x):
        d = np.zeros((self.ncols, self.ln))
        part = (np.abs(x) ** 2).sum(axis=1)
        for inz in range(x.shape[0]):
            d[self.colindx[inz]] += part[inz]
        return d

    def solve(self, tol, maxiter, trace=False):
        p, lm, ln, nc = self.plan, self.lm, self.ln, self.ncols
        nx = p.nnzb_x
        cd = self.cdtype
        v1, v4, v5, v6, v7, v8 = (np.zeros((nx, lm, ln), cd) for _ in range(6))
        rho = np.ones((nc, ln), cd)
        eta = np.zeros((nc, ln), cd)
        tau = np.zeros((nc, ln))
        var = np.zeros((nc, ln))
        status = np.zeros((nc, ln), np.int32)
        for i, s in enumerate(self.subset):
            v5[s] += self.b[i]
        tau[:] = self.nrm2(v5)
        inv_bn2 = 1.0 / tau
        tol2 = tol * tol
        target_bound2 = tol2 * 1e4
        residual2 = 1e300
        it = 0
        ret = 9
        iters_needed = maxiter
        while it < maxiter:
            it += 1
            z35 = self.dotp(self.v3, v5)
            brk = (np.abs(z35) ** 2 < EPSILON) | (np.abs(rho.astype(np.complex128)) ** 2 < EPSILON)
            status = np.where(brk, -1, status)
            beta = np.where(brk, 0, z35 / np.where(brk, 1, rho)).astype(cd)
            rho = np.where(brk, 0, z35).astype(cd)
            v6 = v5 + self._s(beta) * v6
            v4 = v8 + self._s(beta) * v4
            v9 = self.mult(v6)
            v4 = v9 + self._s(beta) * v4
            z34 = self.dotp(self.v3, v4)
            brk = (np.abs(z34) ** 2 < EPSILON) | (np.abs(rho.astype(np.complex128)) ** 2 < EPSILON)
            status = np.where(brk, -2, status)
            alfa = np.where(brk, 0, -rho / np.where(brk, 1, z34)).astype(cd)
            c67 = np.where(brk, 0, z34 * (var * eta / np.where(brk, 1, rho))).astype(cd)
            v7 = v6 + self._s(c67) * v7
            v5 = v5 + self._s(alfa) * v9
            d55 = self.nrm2(v5)
            status, c67_r, eta, var, tau = self._dect(status, var, tau, alfa, d55, True)
            c67 = c67_r
            v1 = v1 + self._s(eta) * v7
            v6 = v6 + self._s(alfa) * v4
            v7 = v6 + self._s(c67) * v7
            v8 = self.mult(v6)
            v5 = v5 + self._s(alfa) * v8
            d55 = self.nrm2(v5)
            status, _, eta, var, tau = self._dect(status, var, tau, alfa, d55, False)
            v1 = v1 + self._s(eta) * v7

            res_ub = tau * inv_bn2
            max_bound2 = res_ub.max() * (2 * it + 1)
            nbrk = int(((status == -1) | (status == -2)).sum())
            probe = (max_bound2 <= target_bound2) or (it >= maxiter)
            if nbrk == nc * ln:
                ret = 6
                break
            if probe:
                y = self.mult(v1)
                for i, s in enumerate(self.subset):
                    y[s] -= self.b[i]
                res2 = self.nrm2(y) * inv_bn2
                max_res2 = max(res2.max(), 1.4e-76)
                is_done = bool(np.all((res2 <= tol2) | (status != 0)))
                status = np.where(res2 <= 0, 1, status)
                residual2 = max_res2
                target_bound2 = (max_bound2 / max_res2) * tol2
                if trace:
                    print(f"it={it} probe res={np.sqrt(max_res2):.3e} "
                          f"bound2={max_bound2:.3e} status={np.unique(status)}")
                if is_done:
                    ret = 0
                    iters_needed = it
                    break
            elif trace and it % 10 == 0:
                print(f"it={it} bound2={max_bound2:.3e} tgt={target_bound2:.3e}"
                      f" tau_max={tau.max():.3e} status={np.unique(status)}")
        return dict(x=v1, status=ret, iterations=iters_needed,
                    residuum=float(np.sqrt(residual2)), rhs_status=status)

    def _s(self, a):
        """broadcast a per-(col, rhs) scalar onto blocks"""
        return a[self.colindx][:, None, :]

    def _dect(self, status, var, tau, alfa, d55, with_c67):
        ok = np.abs(tau) > EPSILON
        Var = np.where(ok, d55 / np.where(ok, tau, 1), 0.0)
        cosi = np.where(ok, 1.0 / (1.0 + Var), 0.0)
        new_tau = np.where(ok, d55 * cosi, 0.0)
        r67 = np.where(ok, Var * cosi, 1.0)
        status = np.where(ok, status, -3)
        eta = np.where(status < 0, 0, -cosi * alfa).astype(self.cdtype)
        c67 = r67.astype(self.cdtype) if with_c67 else None
        return status, c67, eta, np.where(ok, Var, 0.0), new_tau
