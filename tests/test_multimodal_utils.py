"""Conversation template + image preprocessing utility tests."""

import numpy as np
from PIL import Image

from competesmoe_tpu.multimodal.conversation import conv_templates
from competesmoe_tpu.multimodal.mm_utils import (
    ImageProcessorConfig,
    divide_to_patches,
    expand2square,
    get_anyres_image_grid_shape,
    process_images,
    select_best_resolution,
    tokenizer_image_token,
)


def test_phi35_prompt_format():
    conv = conv_templates["phi35"].copy()
    conv.append_message(conv.roles[0], "hello <image>")
    conv.append_message(conv.roles[1], None)
    want = ("<|system|>\nYou are a helpful assistant.<|end|>\n"
            "<|user|>\nhello <image><|end|>\n<|assistant|>\n")
    assert conv.get_prompt() == want


def test_phi3_prompt_format_with_answer():
    conv = conv_templates["phi3"].copy()
    conv.append_message(conv.roles[0], "q1")
    conv.append_message(conv.roles[1], "a1")
    want = "<|user|>\nq1<|end|>\n<|assistant|>\na1<|end|>\n"
    assert conv.get_prompt() == want


def test_vicuna_v1_prompt_format():
    conv = conv_templates["v1"].copy()
    conv.append_message(conv.roles[0], "hi")
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert p.endswith("USER: hi ASSISTANT:")
    assert p.startswith("A chat between")


class FakeTok:
    bos_token_id = 1

    def __call__(self, text):
        class R:
            pass
        r = R()
        # bos + one id per word
        r.input_ids = [1] + [100 + len(w) for w in text.split()]
        return r


def test_tokenizer_image_token():
    ids = tokenizer_image_token("hello <image> world", FakeTok())
    # bos kept once, -200 spliced between chunks
    assert ids[0] == 1
    assert -200 in ids
    i = ids.index(-200)
    assert ids[:i] == [1, 105]
    assert ids[i + 1:] == [105]


def test_expand2square():
    img = Image.new("RGB", (10, 4), (255, 0, 0))
    sq = expand2square(img, (0, 0, 0))
    assert sq.size == (10, 10)


def test_select_best_resolution():
    best = select_best_resolution((1000, 500),
                                  [(672, 672), (1344, 672), (672, 1344)])
    assert best == (1344, 672)
    assert get_anyres_image_grid_shape((1000, 500),
                                       [(672, 672), (1344, 672)],
                                       336) == (4, 2)


def test_process_images_shapes():
    proc = ImageProcessorConfig(size=28)
    imgs = [Image.new("RGB", (50, 30), (128, 128, 128)) for _ in range(2)]
    out = process_images(imgs, proc)
    assert out.shape == (2, 28, 28, 3)
    # normalized: gray 128/255 ~ 0.502 -> (0.502-0.5)/0.5 ~ 0.004
    assert abs(out.mean()) < 0.01
    padded = process_images(imgs, proc, image_aspect_ratio="pad")
    assert padded.shape == (2, 28, 28, 3)


def test_divide_to_patches():
    img = Image.new("RGB", (8, 4))
    ps = divide_to_patches(img, 4)
    assert len(ps) == 2 and ps[0].size == (4, 4)


def test_multiscale_features_s2():
    """S2: tower over scales (1,2) concatenates channels on the base grid."""
    import jax.numpy as jnp
    import numpy as np
    from competesmoe_tpu.models.vision import (
        merge_chessboard,
        multiscale_features,
        split_chessboard,
    )

    # split/merge roundtrip
    x = jnp.asarray(np.arange(2 * 8 * 8 * 3, dtype=np.float32
                              ).reshape(2, 8, 8, 3))
    np.testing.assert_array_equal(
        np.asarray(merge_chessboard(split_chessboard(x, 2), 2)),
        np.asarray(x))

    # fake tower: 14x14 patches -> per-patch mean feature
    def tower(imgs):
        b, h, w, c = imgs.shape
        g = h // 14
        feats = imgs.reshape(b, g, 14, g, 14, c).mean((2, 4))
        return feats.reshape(b, g * g, c)

    px = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 28, 28, 3)).astype(np.float32))
    out = multiscale_features(tower, px, scales=(1, 2))
    assert out.shape == (2, 4, 6)  # base 2x2 grid, channels 3*2
    # scale-1 channels equal the plain tower output
    np.testing.assert_allclose(np.asarray(out[..., :3]),
                               np.asarray(tower(px)), rtol=1e-5)
