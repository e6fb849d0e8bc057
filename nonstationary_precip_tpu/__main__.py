"""CLI dispatcher: ``python -m nonstationary_precip_tpu <experiment> [flags]``.

Lists and launches the experiment drivers (each also runs standalone via
``python -m nonstationary_precip_tpu.experiments.<name>``).
"""

import importlib
import sys

EXPERIMENTS = [
    "seard_spatial",
    "spatial_gibbs",
    "spatio_temporal",
    "spatiotemporal_stationary",
    "spatiotemporal_dgp",
    "temporal",
    "deepgp_spatial",
    "precipitation_baselines",
    "sgpr_bench",
    "field_regression",
]


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help", "list"):
        print("usage: python -m nonstationary_precip_tpu <experiment|serve> [--flag value ...]")
        print("experiments:")
        for name in EXPERIMENTS:
            mod = importlib.import_module(f"nonstationary_precip_tpu.experiments.{name}")
            doc = (mod.__doc__ or "").strip().splitlines()
            head = doc[0] if doc else ""
            print(f"  {name:<28} {head}")
        print("  serve                        batch-inference CLI: fit/restore a model, predict at query points → CSV")
        return
    name = sys.argv[1]
    if name == "serve":
        from nonstationary_precip_tpu import serve

        return serve.main(sys.argv[2:])
    if name not in EXPERIMENTS:
        raise SystemExit(f"unknown experiment {name!r}; try: python -m nonstationary_precip_tpu list")
    mod = importlib.import_module(f"nonstationary_precip_tpu.experiments.{name}")
    mod.main(sys.argv[2:])


if __name__ == "__main__":
    main()
