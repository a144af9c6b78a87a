"""Measure the reference's training-step envelope in PyTorch on this host.

Reproduces the computational shape of the reference training step
(``models/model_base.py:182-218`` + ``models/pipn/pipn_foam.py:59-105``) on the
duct_fixed_boundary config (batch 13, 1500/1000/700 points, PIPN topology) so
``bench.py`` has a measured host-local baseline: forward on all points, D
Jacobian + D^2 Laplacian + 1 pressure-grad autograd passes with create_graph,
composite loss, Adam step. Written from the survey's description, not copied.

Run:  python tools/torch_baseline.py
"""
import json
import time

import torch
from torch import nn

B, NI, NB, NOBS, DIMS = 13, 1500, 1000, 700, 2
DEV = "cuda" if torch.cuda.is_available() else "cpu"


def mlp(sizes, act=nn.SiLU, last_act=False):
    layers = []
    for i in range(len(sizes) - 1):
        layers.append(nn.Linear(sizes[i], sizes[i + 1]))
        if i < len(sizes) - 2 or last_act:
            layers.append(act())
    return nn.Sequential(*layers)


class Pipn(nn.Module):
    def __init__(self):
        super().__init__()
        self.local = mlp([2, 64, 64], last_act=True)
        self.glob = mlp([64 + 5, 96, 128, 1024], last_act=True)
        self.seg = mlp([1024 + 64, 512, 256, 128, 3])

    def forward(self, pts, feats):
        loc = self.local(pts)
        g = self.glob(torch.cat([loc, feats], -1)).max(dim=1, keepdim=True)[0]
        return self.seg(torch.cat([loc, g.expand(-1, loc.shape[1], -1)], -1))


def grad_sum(out, pts):
    return torch.autograd.grad(out, pts, torch.ones_like(out),
                               retain_graph=True, create_graph=True)[0]


def step(model, opt, pts_i, pts_b, feats, target):
    pts_i.requires_grad_(True)
    pts = torch.cat([pts_i, pts_b], dim=1)
    y = model(pts, feats)
    u, p = y[..., :2], y[..., 2:]
    u_i = u[:, :NI]

    jac = torch.stack([grad_sum(u_i[..., d:d + 1], pts_i) for d in range(DIMS)], -2)
    lap = torch.stack(
        [torch.cat([grad_sum(jac[..., i:i + 1, j], pts_i)[..., j:j + 1]
                    for j in range(DIMS)], -1) for i in range(DIMS)], -2)
    dp = grad_sum(p[:, :NI], pts_i)

    cont = jac.diagonal(0, -1, -2).sum(-1).pow(2).mean()
    conv = (jac @ u_i.unsqueeze(-1)).squeeze(-1)
    mom = (conv - 1e-3 * lap.sum(-1) + dp + 14.0 * u_i).pow(2).mean()
    bnd = (u[:, NI:] - target[:, NI:, :2]).pow(2).mean()
    obs = (y[:, :NOBS] - target[:, :NOBS]).pow(2).mean()
    loss = cont + mom + bnd + 100 * obs

    opt.zero_grad()
    loss.backward()
    opt.step()
    return float(loss)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=1)
    args = ap.parse_args()

    torch.manual_seed(8421)
    model = Pipn().to(DEV)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    pts_i = torch.rand(B, NI, 2, device=DEV)
    pts_b = torch.rand(B, NB, 2, device=DEV)
    feats = torch.rand(B, NI + NB, 5, device=DEV)
    target = torch.rand(B, NI + NB, 3, device=DEV)

    for _ in range(args.warmup):  # warmup
        step(model, opt, pts_i.clone(), pts_b, feats, target)
    n = args.steps
    t0 = time.perf_counter()
    for _ in range(n):
        step(model, opt, pts_i.clone(), pts_b, feats, target)
    dt = time.perf_counter() - t0
    print(json.dumps({"torch_device": DEV, "steps_per_sec": n / dt,
                      "batch": B, "points": NI + NB}))


if __name__ == "__main__":
    main()
