"""Loss tests: contrastive machinery vs loop-based oracles, SSIM vs a
torch-free reference, adam vs torch.optim.Adam."""
import numpy as np
import jax
import jax.numpy as jnp

from trase_tpu.losses import contrastive as CL
from trase_tpu.losses.image_losses import l1_loss, ssim
from trase_tpu.losses.style import loss_nnfm_style


def _tiny_setup():
    """2 masks on a 4x4 image; sample every masked pixel deterministically."""
    H = W = 4
    masks = np.zeros((2, H, W), np.float32)
    masks[0, :2, :] = 1  # top half
    masks[1, 1:3, :] = 1  # middle rows (overlaps row 1)
    masked = masks.sum(0) > 0
    pix = np.flatnonzero(masked.reshape(-1))
    P = len(pix)
    sample = CL.PixelSample(
        pixel_idx=jnp.asarray(pix),
        pixel_valid=jnp.ones((P,), bool),
        mask_sel=jnp.ones((2,), bool),
    )
    return jnp.asarray(masks), sample, pix, H, W


def test_correspondence_matrix_matches_bruteforce():
    masks, sample, pix, H, W = _tiny_setup()
    C = np.asarray(CL.pixel_mask_correspondence_matrix(masks, sample))
    m = np.asarray(masks).reshape(2, -1)
    for i, pi in enumerate(pix):
        for j, pj in enumerate(pix):
            expected = float(any(m[k, pi] and m[k, pj] for k in range(2)))
            assert C[i, j] == expected, (i, j)


def test_features_correspondence_is_cosine_gram():
    masks, sample, pix, H, W = _tiny_setup()
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(8, H, W)).astype(np.float32)
    CF = np.asarray(CL.features_correspondence_matrix(jnp.asarray(feats), sample))
    f = feats.reshape(8, -1)[:, pix].T
    f = f / np.linalg.norm(f, axis=1, keepdims=True)
    np.testing.assert_allclose(CF, f @ f.T, atol=1e-5)


def _loop_losses(C, CF, mode, pos_th, neg_th, weights=None):
    """Independent loop-based oracle for the pair losses."""
    P = C.shape[0]
    pos_num = neg_num = 0.0
    pos_cnt = neg_cnt = 0
    pos_sel_cnt = neg_sel_cnt = 0
    for i in range(P):
        for j in range(P):
            if i == j or i > j:  # triu incl diag, diag excluded
                continue
            w = 1.0 if weights is None else weights[i, j]
            # column predicate
            if mode == "all":
                col_pos = (C[:, j] == 1).any()
                col_neg = (C[:, j] == 0).any()
            elif mode == "soft":
                col_pos = ((CF[:, j] < pos_th) & (C[:, j] == 1)).any()
                col_neg = ((CF[:, j] > neg_th) & (C[:, j] == 0)).any()
            if mode in ("all", "soft"):
                if col_pos:
                    pos_cnt += 1
                    if C[i, j] == 1:
                        pos_num += -w * CF[i, j]
                        pos_sel_cnt += 1
                if col_neg:
                    neg_cnt += 1
                    if C[i, j] == 0:
                        neg_num += w * max(CF[i, j], 0.0)
                        neg_sel_cnt += 1
            else:  # hard
                if CF[i, j] < pos_th and C[i, j] == 1:
                    pos_num += -w * CF[i, j]
                    pos_cnt += 1
                    pos_sel_cnt += 1
                if CF[i, j] > neg_th and C[i, j] == 0:
                    neg_num += w * max(CF[i, j], 0.0)
                    neg_cnt += 1
                    neg_sel_cnt += 1
    pos = 0.0 if pos_sel_cnt == 0 else pos_num / max(pos_cnt, 1)
    neg = 0.0 if neg_sel_cnt == 0 else neg_num / max(neg_cnt, 1)
    return pos, neg


def test_pair_losses_match_loop_oracle():
    masks, sample, pix, H, W = _tiny_setup()
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(8, H, W)).astype(np.float32)
    C = np.asarray(CL.pixel_mask_correspondence_matrix(masks, sample))
    CF = np.asarray(CL.features_correspondence_matrix(jnp.asarray(feats), sample))
    weights = np.asarray(CL.pixel_weights(masks, sample))

    for mode in ("all", "soft", "hard"):
        for w in (None, weights):
            pos = CL.positive_pixel_pair_loss[mode](
                jnp.asarray(C), jnp.asarray(CF), sample, 0.75,
                None if w is None else jnp.asarray(w),
            )
            neg = CL.negative_pixel_pair_loss[mode](
                jnp.asarray(C), jnp.asarray(CF), sample, 0.5,
                None if w is None else jnp.asarray(w),
            )
            e_pos, e_neg = _loop_losses(C, CF, mode, 0.75, 0.5, w)
            np.testing.assert_allclose(float(pos), e_pos, atol=1e-5,
                                       err_msg=f"pos {mode} w={w is not None}")
            np.testing.assert_allclose(float(neg), e_neg, atol=1e-5,
                                       err_msg=f"neg {mode} w={w is not None}")


def test_invalid_pixels_are_excluded():
    masks, sample, pix, H, W = _tiny_setup()
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(8, H, W)).astype(np.float32)
    # Mark the last 3 sampled pixels invalid; losses must equal the
    # computation on the reduced valid set.
    P = len(pix)
    valid = np.ones(P, bool)
    valid[-3:] = False
    s2 = sample._replace(pixel_valid=jnp.asarray(valid))
    C_full = np.asarray(CL.pixel_mask_correspondence_matrix(masks, sample))
    CF_full = np.asarray(
        CL.features_correspondence_matrix(jnp.asarray(feats), sample)
    )
    got = float(CL.positive_loss_all(jnp.asarray(C_full), jnp.asarray(CF_full),
                                     s2))
    pv = P - 3
    e_pos, _ = _loop_losses(C_full[:pv, :pv], CF_full[:pv, :pv], "all", 0.75,
                            0.5)
    np.testing.assert_allclose(got, e_pos, atol=1e-5)


def test_ssim_self_is_one():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(size=(3, 32, 32)).astype(np.float32))
    assert abs(float(ssim(img, img)) - 1.0) < 1e-5


def test_ssim_matches_torch_reference():
    """Cross-check against an independent torch implementation of the
    standard windowed SSIM."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(4)
    a = rng.uniform(size=(3, 24, 24)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape).astype(np.float32), 0, 1)

    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))

    # torch oracle
    win = 11
    sigma = 1.5
    g = torch.tensor(
        [np.exp(-((x - win // 2) ** 2) / (2 * sigma**2)) for x in range(win)]
    )
    g = (g / g.sum()).float()
    w2 = (g[:, None] @ g[None, :]).expand(3, 1, win, win).contiguous()
    ta, tb = torch.tensor(a)[None], torch.tensor(b)[None]
    mu1 = F.conv2d(ta, w2, padding=win // 2, groups=3)
    mu2 = F.conv2d(tb, w2, padding=win // 2, groups=3)
    s1 = F.conv2d(ta * ta, w2, padding=win // 2, groups=3) - mu1**2
    s2 = F.conv2d(tb * tb, w2, padding=win // 2, groups=3) - mu2**2
    s12 = F.conv2d(ta * tb, w2, padding=win // 2, groups=3) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    smap = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
    )
    expected = float(smap.mean())
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_nnfm_zero_for_identical():
    rng = np.random.default_rng(5)
    f = jnp.asarray(rng.normal(size=(16, 40)).astype(np.float32))
    assert float(loss_nnfm_style(f, f)) < 1e-5


def test_adam_matches_torch():
    import torch

    from trase_tpu.engine.optim import adam_init, adam_update

    rng = np.random.default_rng(6)
    p0 = rng.normal(size=(7, 3)).astype(np.float32)
    grads = [rng.normal(size=(7, 3)).astype(np.float32) for _ in range(5)]
    lr = 0.01

    tp = torch.nn.Parameter(torch.tensor(p0))
    opt = torch.optim.Adam([tp], lr=lr, eps=1e-15)
    for g in grads:
        tp.grad = torch.tensor(g)
        opt.step()

    jp = jnp.asarray(p0)
    st = adam_init(jp)
    for g in grads:
        jp, st = adam_update(jp, jnp.asarray(g), st, lr)

    np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(), atol=2e-5)


def test_adam_row_mask_freezes_rows():
    from trase_tpu.engine.optim import adam_init, adam_update

    p = jnp.ones((4, 2))
    g = jnp.ones((4, 2))
    mask = jnp.asarray([True, False, True, False])
    st = adam_init(p)
    p2, st2 = adam_update(p, g, st, 0.1, row_mask=mask)
    assert np.all(np.asarray(p2)[1] == 1.0) and np.all(np.asarray(p2)[3] == 1.0)
    assert np.all(np.asarray(p2)[0] != 1.0)
    assert np.all(np.asarray(st2.mu)[1] == 0.0)


def test_bilinear_resize_mm_matches_resize():
    """The matmul-form resize (static 2-tap lerp matrices, dense VJP)
    must reproduce bilinear_resize, including border-clamped taps and
    the no-op same-size case."""
    import jax
    import jax.numpy as jnp

    from trase_tpu.utils.image import bilinear_resize, bilinear_resize_mm

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(37, 53, 6)).astype(np.float32))
    for oh, ow in ((19, 27), (37, 53), (10, 13)):
        want = np.asarray(bilinear_resize(img, oh, ow))
        got = np.asarray(bilinear_resize_mm(img, oh, ow))
        # 2e-5: the dot sums taps in a different association than the
        # two-product lerp (and merges clamped-border taps exactly)
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"{oh}x{ow}")
    # gradient flows and is dense-finite
    g = jax.grad(lambda x: bilinear_resize_mm(x, 19, 27).sum())(img)
    assert np.all(np.isfinite(np.asarray(g)))


def test_bilinear_sample_flat_matches_resize():
    """bilinear_sample_flat == bilinear_resize-then-index (the FEATURE
    step's sampled fast path must be value-identical to the reference's
    full-image resample, incl. at border-clamped taps)."""
    import jax.numpy as jnp

    from trase_tpu.utils.image import bilinear_resize, bilinear_sample_flat

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(37, 53, 6)).astype(np.float32))
    for oh, ow in ((19, 27), (37, 53), (74, 106)):
        full = np.asarray(bilinear_resize(img, oh, ow)).reshape(-1, 6)
        idx = rng.integers(0, oh * ow, size=200)
        # make sure the borders (clamped taps) are covered
        idx[:4] = [0, ow - 1, (oh - 1) * ow, oh * ow - 1]
        got = np.asarray(bilinear_sample_flat(
            img, jnp.asarray(idx, jnp.int32), oh, ow))
        np.testing.assert_allclose(got, full[idx], atol=2e-6,
                                   err_msg=f"{oh}x{ow}")
