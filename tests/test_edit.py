"""Edit ops tests: selection, deletion/extraction/recolour."""

import numpy as np
import jax.numpy as jnp

from gags_tpu.query.edit import (
    EditConfig,
    apply_edit,
    parse_color_func,
    select_by_text,
)
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.core.sh import sh_to_rgb


def _scene(n=20):
    rng = np.random.default_rng(0)
    return GaussianScene(
        means=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        sh=jnp.asarray(rng.normal(size=(n, 16, 3)).astype(np.float32)),
        opacities_raw=jnp.zeros(n),
        scales_raw=jnp.zeros((n, 3)),
        quats=jnp.asarray(np.tile([1, 0, 0, 0], (n, 1)).astype(np.float32)),
        semantic_features=jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32)),
    )


def test_select_argmax_and_threshold():
    e = np.eye(4, 8, dtype=np.float32)  # 4 object embeds
    decoded = np.zeros((6, 8), np.float32)
    decoded[0, 0] = 1  # obj 0
    decoded[1, 1] = 1  # obj 1
    decoded[2, 1] = 0.9
    decoded[3, 2] = 1
    decoded[4, 3] = 1
    decoded[5, 0] = 0.2
    m = select_by_text(jnp.asarray(decoded), jnp.asarray(e), [1], None)
    np.testing.assert_array_equal(np.asarray(m), [False, True, True, False, False, False])
    # threshold mode works on cosine similarity — row 5's small vector
    # normalises to a unit vector along dim 0 and is selected too
    m2 = select_by_text(jnp.asarray(decoded), jnp.asarray(e), [0], 0.5)
    np.testing.assert_array_equal(np.asarray(m2), [True, False, False, False, False, True])


def test_deletion_extraction():
    s = _scene(10)
    mask = jnp.asarray([True] * 3 + [False] * 7)
    assert apply_edit(s, mask, "deletion").num_gaussians == 7
    ext = apply_edit(s, mask, "extraction")
    assert ext.num_gaussians == 3
    np.testing.assert_allclose(np.asarray(ext.means), np.asarray(s.means[:3]))


def test_color_func_swaps_channels():
    s = _scene(5)
    mask = jnp.asarray([True, False, True, False, False])
    fn = parse_color_func("lambda color: color[..., [2, 1, 0]]")
    out = apply_edit(s, mask, "color_func", fn)
    rgb_in = np.asarray(sh_to_rgb(s.sh[:, 0, :]))
    rgb_out = np.asarray(sh_to_rgb(out.sh[:, 0, :]))
    np.testing.assert_allclose(rgb_out[0], rgb_in[0, ::-1], rtol=1e-5)
    np.testing.assert_allclose(rgb_out[1], rgb_in[1], rtol=1e-5)
    # higher-order SH zeroed only on edited gaussians
    assert float(jnp.abs(out.sh[0, 1:]).max()) == 0.0
    assert float(jnp.abs(out.sh[1, 1:]).max()) > 0.0


def test_edit_config_yaml(tmp_path):
    p = tmp_path / "edit.yaml"
    p.write_text(
        "edit:\n  objects: [\"car\", \"tree\"]\n  operations: \"deletion\"\n"
        "  targets: \"car\"\n  threshold: 0.2\n"
    )
    cfg = EditConfig.from_yaml(str(p))
    assert cfg.objects == ["car", "tree"]
    assert cfg.operation == "deletion"
    assert cfg.targets == ["car"]
    assert cfg.threshold == 0.2


def test_clip_editor_stochastic_encoding():
    """CLIPEditor (reference utils/clip_utils.py:9-58): augmented views are
    distinct but stay semantically close; shapes/normalisation correct."""
    import jax
    import jax.numpy as jnp
    from gags_tpu.models.clip import CLIP, CLIPConfig
    from gags_tpu.query.clip_editor import CLIPEditor, augment_image

    cfg = CLIPConfig.tiny()
    model = CLIP(cfg)
    imgs = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    toks = jnp.zeros((1, cfg.context_length), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), imgs, toks)
    ed = CLIPEditor(cfg, params)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 1, (48, 40, 3)).astype(np.float32))

    plain = ed.encode_image(image)
    assert plain.shape == (1, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(plain), axis=-1), 1.0, atol=1e-5)

    emb = ed.encode_image(image, stochastic=4, key=jax.random.PRNGKey(1))
    assert emb.shape == (4, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5)
    # views differ (stochastic), embeddings differ but not wildly
    e = np.asarray(emb)
    assert np.abs(e[0] - e[1]).max() > 0
    # determinism under the same key
    emb2 = ed.encode_image(image, stochastic=4, key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(emb2), e, atol=1e-6)

    # augment_image: output shape & range; zero rotation corners are filled
    v = augment_image(image, jax.random.PRNGKey(2), cfg.image_size)
    assert v.shape == (cfg.image_size, cfg.image_size, 3)
    assert np.isfinite(np.asarray(v)).all()
