"""Reference-equivalent PyTorch baseline for bench.py's vs_baseline ratio.

The reference (torchmd/mdgrad) cannot run here directly: it requires ASE
and a CUDA GPU, neither of which this environment has.  This script
re-creates the reference's *computational pipeline* for the north-star
workload (water SchNet + pair prior under a Nose-Hoover chain,
BASELINE.json) in PyTorch on CPU, following the reference's algorithmic
structure step for step:

  * dense O(N^2) neighbor rebuild every step (torchmd/topology.py:30-73,
    topology_update_freq=1 default md.py:112)
  * SchNet message passing with index_add scatter (nff/nn/modules.py:514,
    graphconv.py:43-53) and force = -autograd.grad(U, q, create_graph)
    (md.py:227-228)
  * NHC EOM + velocity-Verlet stepping in a per-step Python loop
    (tinydiffeq.py:67-75, sovlers.py:110-127), two EOM evals per step
  * direct-backprop mode (adjoint=False): graph kept through all steps,
    then one backward from a positions loss (the reference's
    non-adjoint path, md.py:88-90)

Writes benchmarks/baseline_torch.json.  The measured number is an
*algorithm-equivalent CPU* baseline; the reference's own GPU numbers were
never published (BASELINE.md).
"""

import json
import os
import time
import math

import numpy as np
import torch


def build_water_like(size=4):
    # diamond lattice at water O-O density, a = 6.224 A (registry
    # H20_298K_redd)
    a = 6.2242
    basis = np.array([[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0]])
    basis = np.concatenate([basis, basis + 0.25])
    cells = np.stack(np.meshgrid(*[np.arange(size)] * 3, indexing="ij"),
                     axis=-1).reshape(-1, 3)
    frac = (cells[:, None] + basis[None]).reshape(-1, 3)
    xyz = frac * a
    cell = np.diag([a * size] * 3)
    return torch.tensor(xyz, dtype=torch.float32), \
        torch.tensor(cell, dtype=torch.float32)


def nbr_list(xyz, cell, cutoff):
    # dense displacement + minimum image + triu nonzero, as the reference
    d = xyz[None, :, :] - xyz[:, None, :]
    red = d @ torch.linalg.inv(cell)
    off = -(red > 0.5).float() + (red < -0.5).float()
    d = d + off @ cell
    dsq = torch.triu((d ** 2).sum(-1))
    mask = (dsq < cutoff ** 2) & (dsq != 0)
    idx = torch.nonzero(torch.triu(mask.long()))
    return idx, off[idx[:, 0], idx[:, 1]]


class SchNetTorch(torch.nn.Module):
    def __init__(self, basis=128, filters=128, gauss=40, convs=2,
                 cutoff=6.0):
        super().__init__()
        self.embed = torch.nn.Embedding(100, basis)
        self.cutoff = cutoff
        self.gauss = gauss
        self.convs = torch.nn.ModuleList()
        for _ in range(convs):
            self.convs.append(torch.nn.ModuleDict({
                "edge1": torch.nn.Linear(gauss, gauss),
                "edge2": torch.nn.Linear(gauss, filters),
                "node": torch.nn.Linear(basis, filters),
                "up1": torch.nn.Linear(filters, basis),
                "up2": torch.nn.Linear(basis, basis),
            }))
        self.read1 = torch.nn.Linear(basis, basis // 2)
        self.read2 = torch.nn.Linear(basis // 2, 1)
        off = torch.linspace(0, cutoff, gauss)
        self.register_buffer("offsets", off)
        self.register_buffer("width", torch.full((gauss,), off[1] - off[0]))

    def forward(self, z, xyz, idx, offsets_cell):
        e = (xyz[idx[:, 0]] - xyz[idx[:, 1]] - offsets_cell)
        e = e.pow(2).sum(1).sqrt()[:, None]
        ssp = torch.nn.functional.softplus
        ef = torch.exp(-0.5 * ((e - self.offsets) / self.width) ** 2)
        r = self.embed(z)
        n = r.shape[0]
        for c in self.convs:
            f = c["edge2"](ssp(c["edge1"](ef)) - math.log(2.0))
            rf = c["node"](r)
            m_ij, m_ji = rf[idx[:, 0]] * f, rf[idx[:, 1]] * f
            agg = torch.zeros_like(rf)
            agg = agg.index_add(0, idx[:, 1], m_ij)
            agg = agg.index_add(0, idx[:, 0], m_ji)
            r = r + c["up2"](ssp(c["up1"](agg)) - math.log(2.0))
        return self.read2(ssp(self.read1(r)) - math.log(2.0)).sum()


def run(n_steps=6, size=4, cutoff=6.0):
    torch.set_num_threads(os.cpu_count())
    xyz, cell = build_water_like(size)
    n = len(xyz)
    z = torch.full((n,), 8, dtype=torch.long)
    mass = torch.full((n, 1), 18.01528)
    model = SchNetTorch(cutoff=cutoff)
    kT, ndof = 298.0 * 8.617333e-5, 3 * n
    Q = torch.tensor([50.0] + [50.0 / n] * 4)

    def energy(q):
        idx, off = nbr_list(q.detach(), cell, cutoff)
        u_nn = model(z, q, idx, off @ cell)
        # pair prior (ExcludedVolume)
        d = (q[idx[:, 0]] - q[idx[:, 1]] - off @ cell).pow(2).sum(1).sqrt()
        u_pr = (4 * 0.01 * (2.6 / d) ** 12).sum()
        return u_nn + u_pr

    def derivs(v, q, pv):
        q = q.requires_grad_(True) if not q.requires_grad else q
        u = energy(q)
        f = -torch.autograd.grad(u, q, create_graph=True)[0]
        p = v * mass
        ke = 0.5 * (p ** 2 / mass).sum()
        dvdt = (f - pv[0] * p / Q[0]) / mass
        dpv0 = 2 * (ke - kT * ndof * 0.5) - pv[0] * pv[1] / Q[1]
        dmid = (pv[:-2] ** 2 / Q[:-2] - kT) - pv[2:] * pv[1:-1] / Q[2:]
        dlast = pv[-2] ** 2 / Q[-2] - kT
        return dvdt, v, torch.cat([dpv0[None], dmid, dlast[None]])

    dt = 0.5 * 0.0982269
    v = torch.randn(n, 3) * 0.01
    q = xyz.clone().requires_grad_(True)
    pv = torch.zeros(5)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        a0, _, dpv0 = derivs(v, q, pv)
        vh, pvh = v + 0.5 * dt * a0, pv + 0.5 * dt * dpv0
        qn = q + vh * dt
        a1, _, dpv1 = derivs(vh, qn, pvh)
        v, pv, q = vh + 0.5 * dt * a1, pvh + 0.5 * dt * dpv1, qn
    loss = (q ** 2).sum()
    loss.backward()
    elapsed = time.perf_counter() - t0
    return n_steps / elapsed, n


if __name__ == "__main__":
    sps, n = run()
    out = {"water_schnet_nhc_fwdbwd_steps_per_sec": sps, "n_atoms": n,
           "device": "cpu", "torch_threads": torch.get_num_threads(),
           "note": "reference-algorithm-equivalent torch pipeline; see "
                   "module docstring"}
    path = os.path.join(os.path.dirname(__file__), "baseline_torch.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
