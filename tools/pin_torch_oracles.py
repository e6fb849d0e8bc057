"""Pin the torch-float64 oracle outputs of tests/test_torch_parity.py as a
committed fixture (tests/fixtures/torch_oracles.npz).

The live parity tests compare against torch *at test time*; if a torch
upgrade ever changed numerics, the parity claim would silently drift.
This script freezes the oracle values (inputs AND outputs) computed by
the torch build present when parity was established, so
tests/test_oracle_fixtures.py can keep asserting against the exact
pinned numbers with no torch dependency.

Inputs replicate each parity test's ``rng`` fixture draws
(np.random.default_rng(173), fresh per test — tests/conftest.py:44).

Run: python tools/pin_torch_oracles.py  (regenerates the .npz; only do
this deliberately, with a note in the commit message).
"""

import pathlib

import numpy as np
import torch

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def _softplus(x):
    return torch.nn.functional.softplus(x)


def pin_exact_gp(store):
    rng = np.random.default_rng(173)
    n, d = 30, 2
    x = rng.normal(size=(n, d))
    y = np.sin(x[:, 0]) + 0.1 * rng.normal(size=n)
    raw_ell = rng.normal(size=d) * 0.3
    raw_scale, raw_noise, mean_c = 0.2, -1.1, 0.15

    t_ell = torch.tensor(raw_ell, dtype=torch.float64, requires_grad=True)
    t_scale = torch.tensor(raw_scale, dtype=torch.float64, requires_grad=True)
    t_noise = torch.tensor(raw_noise, dtype=torch.float64, requires_grad=True)
    t_mean = torch.tensor(mean_c, dtype=torch.float64, requires_grad=True)
    tx = torch.tensor(x, dtype=torch.float64)
    ty = torch.tensor(y, dtype=torch.float64)

    ell = _softplus(t_ell)
    s2 = _softplus(t_scale)
    noise = _softplus(t_noise) + 1e-4
    xs = tx / ell
    d2 = torch.cdist(xs, xs) ** 2
    k = s2 * torch.exp(-0.5 * d2) + noise * torch.eye(n, dtype=torch.float64)
    dist = torch.distributions.MultivariateNormal(
        t_mean * torch.ones(n, dtype=torch.float64), covariance_matrix=k
    )
    loss = -dist.log_prob(ty) / n
    loss.backward()

    store.update(
        eg_x=x, eg_y=y, eg_raw_ell=raw_ell,
        eg_raw_scale=raw_scale, eg_raw_noise=raw_noise, eg_mean_c=mean_c,
        eg_loss=float(loss), eg_g_ell=t_ell.grad.numpy(),
        eg_g_scale=float(t_scale.grad), eg_g_noise=float(t_noise.grad),
        eg_g_mean=float(t_mean.grad),
    )


def pin_gibbs_map(store):
    rng = np.random.default_rng(173)
    n, d = 16, 2
    x = rng.normal(size=(n, d))
    y = np.sin(x[:, 0]) + 0.1 * rng.normal(size=n)
    log_ell0 = rng.normal(size=(n, d)) * 0.2 + np.log(0.3)
    noise, s2 = 0.011, 0.644
    pm, ps2, pell = np.log(0.3), 1.0, 1.3

    tx = torch.tensor(x, dtype=torch.float64)
    ty = torch.tensor(y, dtype=torch.float64)
    t_log_ell = torch.tensor(log_ell0, dtype=torch.float64, requires_grad=True)

    ell = torch.exp(t_log_ell)
    ss = ell[:, None, :] ** 2 + ell[None, :, :] ** 2
    pref = torch.prod(torch.sqrt(2 * ell[:, None, :] * ell[None, :, :] / ss), dim=-1)
    quad = torch.sum((tx[:, None, :] - tx[None, :, :]) ** 2 / ss, dim=-1)
    k = s2 * pref * torch.exp(-quad) + noise * torch.eye(n, dtype=torch.float64)
    logp = torch.distributions.MultivariateNormal(
        torch.zeros(n, dtype=torch.float64), covariance_matrix=k
    ).log_prob(ty)

    dist2 = torch.cdist(tx / pell, tx / pell) ** 2
    kp = ps2 * torch.exp(-0.5 * dist2) + 1e-4 * torch.eye(n, dtype=torch.float64)
    prior_lp = 0.0
    for dd in range(d):
        prior_lp = prior_lp + torch.distributions.MultivariateNormal(
            pm * torch.ones(n, dtype=torch.float64), covariance_matrix=kp
        ).log_prob(t_log_ell[:, dd])
    loss = -(logp + prior_lp / n) / n
    loss.backward()

    store.update(
        gm_x=x, gm_y=y, gm_log_ell0=log_ell0,
        gm_loss=float(loss), gm_g_log_ell=t_log_ell.grad.numpy(),
    )


def pin_gibbs_predict(store):
    rng = np.random.default_rng(173)
    n, m, d = 14, 6, 2
    x = rng.normal(size=(n, d))
    xs = rng.normal(size=(m, d))
    y = np.sin(x[:, 0])
    log_ell = rng.normal(size=(n, d)) * 0.2 + np.log(0.3)
    noise, s2 = 0.011, 0.644
    pm, ps2, pell = np.log(0.3), 1.0, 1.3

    tx, txs = torch.tensor(x), torch.tensor(xs)
    ell1 = torch.exp(torch.tensor(log_ell))

    def prior_gram(a, b):
        return ps2 * torch.exp(-0.5 * (torch.cdist(a / pell, b / pell) ** 2))

    kg = prior_gram(tx, tx) + 1e-4 * torch.eye(n, dtype=torch.float64)
    ksg = prior_gram(txs, tx)
    ell2 = torch.exp(pm + ksg @ torch.linalg.solve(kg, torch.log(ell1) - pm))

    def gibbs(a, ea, b, eb):
        ss = ea[:, None, :] ** 2 + eb[None, :, :] ** 2
        pref = torch.prod(torch.sqrt(2 * ea[:, None, :] * eb[None, :, :] / ss), dim=-1)
        quad = torch.sum((a[:, None, :] - b[None, :, :]) ** 2 / ss, dim=-1)
        return s2 * pref * torch.exp(-quad)

    k_xx = gibbs(tx, ell1, tx, ell1) + noise * torch.eye(n, dtype=torch.float64)
    k_sx = gibbs(txs, ell2, tx, ell1)
    k_ss = gibbs(txs, ell2, txs, ell2)
    mu = k_sx @ torch.linalg.solve(k_xx, torch.tensor(y))
    sigma = (
        k_ss
        - k_sx @ torch.linalg.solve(k_xx, k_sx.T)
        + 1e-4 * torch.eye(m, dtype=torch.float64)
    )

    store.update(
        gp_x=x, gp_xs=xs, gp_y=y, gp_log_ell=log_ell,
        gp_mu=mu.numpy(), gp_sigma=sigma.numpy(),
    )


def pin_gibbs_gram(store):
    rng = np.random.default_rng(173)
    n1, n2, d = 14, 9, 2
    x1 = rng.normal(size=(n1, d))
    x2 = rng.normal(size=(n2, d))
    e1 = np.exp(rng.normal(size=(n1, d)) * 0.3)
    e2 = np.exp(rng.normal(size=(n2, d)) * 0.3)

    tx1, tx2 = torch.tensor(x1), torch.tensor(x2)
    te1, te2 = torch.tensor(e1), torch.tensor(e2)
    ss = te1[:, None, :] ** 2 + te2[None, :, :] ** 2
    pref = torch.prod(torch.sqrt(2 * te1[:, None, :] * te2[None, :, :] / ss), dim=-1)
    quad = torch.sum((tx1[:, None, :] - tx2[None, :, :]) ** 2 / ss, dim=-1)
    gram = (pref * torch.exp(-quad)).numpy()

    store.update(gg_x1=x1, gg_x2=x2, gg_e1=e1, gg_e2=e2, gg_gram=gram)


def main():
    OUT.mkdir(exist_ok=True)
    store = {"torch_version": np.str_(torch.__version__)}
    pin_exact_gp(store)
    pin_gibbs_map(store)
    pin_gibbs_predict(store)
    pin_gibbs_gram(store)
    path = OUT / "torch_oracles.npz"
    np.savez_compressed(path, **store)
    print(f"pinned {len(store)} arrays to {path} (torch {torch.__version__})")


if __name__ == "__main__":
    main()
