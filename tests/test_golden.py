"""Golden-value regression freeze.

Captures the full forward's outputs for a fixed seed into a committed .npz;
later rounds immediately see any unintended numerical drift in the model,
ops, or checkpoint-affecting refactors. Regenerate deliberately with:
    python -m tests.test_golden regen
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_forward.npz")


def _compute():
    from ev2hands_tpu.config import ModelConfig
    from ev2hands_tpu.mano import create_mano_hands, synthetic_mano_models
    from ev2hands_tpu.model import TEHNet, apply_mano

    cfg = ModelConfig(n_points=256, fps_deterministic=True, grouping="gather")
    net = TEHNet(cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(42), (2, 256, 5))
    variables = net.init({"params": jax.random.PRNGKey(7)}, x, train=False)
    out = net.apply(variables, x, train=False)
    hands = {s: h.params for s, h in
             create_mano_hands(synthetic_mano_models(0)).items()}
    out = apply_mano(hands, out)
    return {
        "class_logits": np.asarray(out["class_logits"]),
        "left_transl": np.asarray(out["left"]["transl"]),
        "right_betas": np.asarray(out["right"]["betas"]),
        "left_vertices_sample": np.asarray(out["left"]["vertices"][:, ::97, :]),
        "right_j3d": np.asarray(out["right"]["j3d"]),
    }


def test_golden_forward():
    got = _compute()
    if not os.path.exists(GOLDEN):
        np.savez(GOLDEN, **got)
        raise AssertionError(
            "golden file was missing and has been regenerated; commit it and "
            "re-run"
        )
    ref = np.load(GOLDEN)
    for k in ref.files:
        np.testing.assert_allclose(
            got[k], ref[k], atol=1e-4, rtol=1e-4,
            err_msg=f"golden drift in {k} — if intentional, regenerate via "
                    f"`python -m tests.test_golden regen`",
        )


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        import os as _os

        _os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        np.savez(GOLDEN, **_compute())
        print(f"regenerated {GOLDEN}")
