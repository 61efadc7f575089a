"""Architecture-space differential fuzz of the TF-free Keras importer.

The released Cacophony checkpoints (reference src/identify_tracks.py:302-327)
cannot be fetched offline, so the importer's zoo
(audio_analysis_tpu/models/keras_graph.py) is only as trustworthy as the
architectures it has been tested on. This sweep generates RANDOM Keras
functional models — seeded draws over the full supported zoo: 1-D/2-D convs
(strided/dilated/grouped/causal/depthwise/separable/transpose), pools,
pad/crop/upsample, norms (Batch/Layer/Unit), every activation layer class,
residual branches with all seven merge layers, nested Functional/Sequential
submodels, Keras-3 op-layers (raw arithmetic/keras.ops on KerasTensors) and
tensor slicing — saves each as a real ``.keras`` archive, imports it TF-free,
and asserts logit parity against ``model.predict`` on random inputs.

Usage: python tools/keras_arch_fuzz.py [N_SEEDS] [--start S]
Exit 0 = every seed round-tripped within tolerance; failures print the seed
and the model's layer stack, capped at 5 repros, and exit 1.

A CI slice runs as tests/test_keras_arch_fuzz.py (fast + slow tiers).
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Pure importer parity — force CPU (the axon TPU plugin ignores
# JAX_PLATFORMS; fresh-program tunnel compiles are 6s-6min each).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Tolerance: importer uses float32 with XLA fusion; TF uses oneDNN. Conv
# chains reorder accumulations, so compare against the output magnitude.
REL_TOL = 2e-4


def _act(rng):
    return rng.choice(
        ["linear", "relu", "sigmoid", "tanh", "softmax", "elu", "selu",
         "softplus", "swish", "gelu", "hard_sigmoid", "relu6", "silu"]
    )


def _divisors(n, cap=4):
    return [d for d in range(1, min(n, cap) + 1) if n % d == 0]


class _Gen:
    """One seeded random-model draw. Tracks tensor shapes through Keras
    itself (KerasTensor.shape) so every sampled layer is statically valid.

    flavor "k3" = modern keras 3 (op-layers, __slice__ specs); "k2" =
    tf_keras (Keras 2) archives — the generation the RELEASED Cacophony
    checkpoints were saved by: raw-TF-op use serializes as
    TFOpLambda/SlicingOpLambda with flat legacy nodes."""

    def __init__(self, seed, flavor="k3"):
        if flavor == "k2":
            import tf_keras as keras

            kl = keras.layers
        else:
            import keras
            from keras import layers as kl

        self.flavor = flavor
        self.keras = keras
        self.kl = kl
        self.rng = np.random.RandomState(seed)
        self.names = iter(f"l{i}" for i in range(10_000))

    # -- helpers -------------------------------------------------------
    def _spatial(self, x):
        return tuple(int(d) for d in x.shape[1:-1])

    def _ch(self, x):
        return int(x.shape[-1])

    def _rank(self, x):
        return len(x.shape) - 2  # spatial rank: 1 or 2

    # -- unary layer samplers ------------------------------------------
    def conv(self, x):
        kl, rng = self.kl, self.rng
        r = self._rank(x)
        sp = self._spatial(x)
        ch = self._ch(x)
        kind = rng.choice(["plain", "depthwise", "separable", "transpose"])
        k = int(rng.randint(1, 4))
        if min(sp) < k:
            k = 1
        stride = int(rng.choice([1, 1, 2]))
        if min(sp) < 2:
            stride = 1
        dil = int(rng.choice([1, 1, 2])) if stride == 1 else 1
        if min(sp) <= (k - 1) * dil:
            dil = 1
        pad = rng.choice(["same", "valid"])
        if pad == "valid" and min(sp) < (k - 1) * dil + 1:
            pad = "same"
        filters = int(rng.randint(2, 9))
        act = _act(rng)
        if r == 2:
            if kind == "plain":
                groups = int(rng.choice(_divisors(ch))) if stride == 1 else 1
                filters = max(filters // groups, 1) * groups
                return kl.Conv2D(filters, k, strides=stride, padding=pad,
                                 dilation_rate=dil, groups=groups,
                                 activation=act, name=next(self.names))(x)
            if kind == "depthwise":
                return kl.DepthwiseConv2D(k, strides=stride, padding=pad,
                                          dilation_rate=dil,
                                          depth_multiplier=int(rng.randint(1, 3)),
                                          activation=act, name=next(self.names))(x)
            if kind == "separable":
                return kl.SeparableConv2D(filters, k, strides=stride, padding=pad,
                                          dilation_rate=dil, activation=act,
                                          name=next(self.names))(x)
            return kl.Conv2DTranspose(filters, k, strides=stride, padding=pad,
                                      activation=act, name=next(self.names))(x)
        # rank 1
        if kind == "plain":
            p1 = rng.choice(["same", "valid", "causal"]) if pad == "same" else pad
            if p1 == "valid" and sp[0] < (k - 1) * dil + 1:
                p1 = "same"
            groups = int(rng.choice(_divisors(ch))) if stride == 1 else 1
            filters = max(filters // groups, 1) * groups
            return kl.Conv1D(filters, k, strides=stride, padding=p1,
                             dilation_rate=dil, groups=groups,
                             activation=act, name=next(self.names))(x)
        if kind == "depthwise":
            return kl.DepthwiseConv1D(k, strides=stride, padding=pad,
                                      dilation_rate=dil,
                                      depth_multiplier=int(rng.randint(1, 3)),
                                      activation=act, name=next(self.names))(x)
        if kind == "separable":
            return kl.SeparableConv1D(filters, k, strides=stride, padding=pad,
                                      dilation_rate=dil, activation=act,
                                      name=next(self.names))(x)
        return kl.Conv1DTranspose(filters, k, strides=stride, padding=pad,
                                  activation=act, name=next(self.names))(x)

    def pool(self, x):
        kl, rng = self.kl, self.rng
        r = self._rank(x)
        sp = self._spatial(x)
        if min(sp) < 2:
            return x
        p = int(rng.randint(2, 4))
        if min(sp) < p:
            p = 2
        pad = rng.choice(["valid", "same"])
        s = int(rng.choice([0, p, 1, 2]))  # 0 -> default (=pool)
        s = s or None
        if r == 2:
            cls = kl.MaxPooling2D if rng.rand() < 0.5 else kl.AveragePooling2D
        else:
            cls = kl.MaxPooling1D if rng.rand() < 0.5 else kl.AveragePooling1D
        return cls(p, strides=s, padding=pad, name=next(self.names))(x)

    def padcrop(self, x):
        kl, rng = self.kl, self.rng
        r = self._rank(x)
        sp = self._spatial(x)
        which = rng.choice(["pad", "crop", "up"])
        if which == "up" and max(sp) > 24:
            which = "pad"
        if r == 2:
            if which == "pad":
                return kl.ZeroPadding2D(((int(rng.randint(0, 3)), int(rng.randint(0, 3))),
                                         (int(rng.randint(0, 3)), int(rng.randint(0, 3)))),
                                        name=next(self.names))(x)
            if which == "crop":
                ca = min(int(rng.randint(0, 2)), (sp[0] - 1) // 2)
                cb = min(int(rng.randint(0, 2)), (sp[1] - 1) // 2)
                return kl.Cropping2D((ca, cb), name=next(self.names))(x)
            return kl.UpSampling2D(int(rng.randint(1, 3)), name=next(self.names))(x)
        if which == "pad":
            return kl.ZeroPadding1D((int(rng.randint(0, 3)), int(rng.randint(0, 3))),
                                    name=next(self.names))(x)
        if which == "crop":
            c = min(int(rng.randint(0, 2)), (sp[0] - 1) // 2)
            return kl.Cropping1D(c, name=next(self.names))(x)
        return kl.UpSampling1D(int(rng.randint(1, 3)), name=next(self.names))(x)

    def norm(self, x):
        kl, rng = self.kl, self.rng
        which = rng.choice(["bn", "ln", "un"])
        if which == "bn":
            return kl.BatchNormalization(
                center=bool(rng.rand() < 0.8), scale=bool(rng.rand() < 0.8),
                epsilon=float(rng.choice([1e-3, 1e-5])), name=next(self.names))(x)
        if which == "ln":
            nd = len(x.shape)
            ax = rng.choice(["last", "spatial"])
            if self.flavor == "k2":
                # tf_keras's fused LN path crashes at predict time on some
                # multi-axis configs ("scale must be 1D") — the oracle
                # itself can't run them, so k2 sticks to the last axis
                ax = "last"
            axis = -1 if ax == "last" else list(range(1, nd))
            return kl.LayerNormalization(
                axis=axis, center=bool(rng.rand() < 0.8),
                scale=bool(rng.rand() < 0.8),
                epsilon=float(rng.choice([1e-3, 1e-4])), name=next(self.names))(x)
        return kl.UnitNormalization(name=next(self.names))(x)

    def act_layer(self, x):
        kl, rng = self.kl, self.rng
        which = rng.randint(0, 7)
        if which == 0:
            return kl.ReLU(max_value=float(rng.choice([6.0, 0, 3.0])) or None,
                           negative_slope=float(rng.choice([0.0, 0.1])),
                           name=next(self.names))(x)
        if which == 1:
            return kl.LeakyReLU(float(rng.choice([0.1, 0.3])), name=next(self.names))(x)
        if which == 2:
            return kl.ELU(float(rng.choice([0.5, 1.0])), name=next(self.names))(x)
        if which == 3:
            shared = [i + 1 for i in range(self._rank(x))] if rng.rand() < 0.5 else None
            return kl.PReLU(shared_axes=shared, name=next(self.names),
                            alpha_initializer="glorot_uniform")(x)
        if which == 4:
            return kl.Softmax(name=next(self.names))(x)
        if which == 5:
            return kl.Activation(_act(rng), name=next(self.names))(x)
        return kl.Rescaling(float(rng.randn()), float(rng.randn()),
                            name=next(self.names))(x)

    def op_chain(self, x):
        """Raw-op use on symbolic tensors: keras-3 op-layers, or (k2) the
        TFOpLambda/SlicingOpLambda layers tf_keras serializes for the same
        source code."""
        rng = self.rng
        if self.flavor == "k2":
            import tensorflow as tf

            for _ in range(rng.randint(1, 4)):
                which = rng.randint(0, 8)
                if which == 0:
                    x = x * float(rng.randn())
                elif which == 1:
                    x = x + float(rng.randn())
                elif which == 2:
                    x = tf.nn.relu(x)
                elif which == 3:
                    x = tf.clip_by_value(x, -3.0, 3.0)
                elif which == 4:
                    x = tf.math.maximum(x, 0.1)
                elif which == 5:
                    x = tf.math.tanh(x)
                elif which == 6:
                    sp = self._spatial(x)
                    if sp[0] >= 4:
                        lo = int(rng.randint(0, sp[0] // 2))
                        hi = int(rng.randint(sp[0] // 2 + 1, sp[0] + 1))
                        x = x[:, lo:hi]
                else:
                    x = tf.math.reduce_mean(x, axis=-1, keepdims=True)
            return x
        ops = self.keras.ops
        for _ in range(rng.randint(1, 4)):
            which = rng.randint(0, 8)
            if which == 0:
                x = x * float(rng.randn())
            elif which == 1:
                x = x + float(rng.randn())
            elif which == 2:
                x = ops.relu(x)
            elif which == 3:
                x = ops.clip(x, -3.0, 3.0)
            elif which == 4:
                x = ops.maximum(x, 0.1)
            elif which == 5:
                x = ops.tanh(x)
            elif which == 6:
                sp = self._spatial(x)
                if sp[0] >= 4:
                    lo = int(rng.randint(0, sp[0] // 2))
                    hi = int(rng.randint(sp[0] // 2 + 1, sp[0] + 1))
                    x = x[:, lo:hi]
            else:
                x = ops.mean(x, axis=-1, keepdims=True)
        return x

    def merge_block(self, x):
        """Two random unary chains from x, merged; channel-matched by the
        merge class's requirement."""
        kl, rng = self.kl, self.rng
        a = self.unary(x)
        b = self.unary(x)
        # force both branches back to a common shape with a 1x1 projection
        ch = int(rng.randint(2, 9))
        r = self._rank(x)
        conv = kl.Conv2D if r == 2 else kl.Conv1D
        a = conv(ch, 1, name=next(self.names))(a)
        b = conv(ch, 1, name=next(self.names))(b)
        # spatial dims may differ after the chains; crop/pool can change them.
        if tuple(a.shape[1:]) != tuple(b.shape[1:]):
            target = tuple(int(d) for d in x.shape[1:-1])
            a = self._resize_to(a, target)
            b = self._resize_to(b, target)
        cls = rng.choice(["Add", "Subtract", "Multiply", "Average",
                          "Maximum", "Minimum", "Concatenate"])
        layer = getattr(kl, cls)
        if cls == "Concatenate":
            return layer(axis=-1, name=next(self.names))([a, b])
        return layer(name=next(self.names))([a, b])

    def _resize_to(self, x, target):
        """Force spatial dims to `target` with a global pool + dense-free
        trick: pool to 1 then upsample. Cheap and always valid."""
        kl = self.kl
        r = self._rank(x)
        if r == 2:
            x = kl.GlobalAveragePooling2D(keepdims=True)(x)
            return kl.UpSampling2D(target)(x)
        x = kl.GlobalAveragePooling1D(keepdims=True)(x)
        return kl.UpSampling1D(target[0])(x)

    def nested(self, x):
        """Wrap a random chain in a nested Functional or Sequential model."""
        keras, kl, rng = self.keras, self.kl, self.rng
        inner_in = keras.Input(tuple(int(d) for d in x.shape[1:]))
        y = inner_in
        for _ in range(rng.randint(1, 3)):
            y = self.unary(y)
        if rng.rand() < 0.5:
            inner = keras.Model(inner_in, y, name=f"sub_{next(self.names)}")
            return inner(x)
        # Sequential of shape-preserving layers
        seq = keras.Sequential(name=f"seq_{next(self.names)}")
        ch = self._ch(x)
        conv = kl.Conv2D if self._rank(x) == 2 else kl.Conv1D
        seq.add(keras.Input(tuple(int(d) for d in x.shape[1:])))
        seq.add(conv(ch, 1, activation=_act(rng)))
        seq.add(kl.BatchNormalization())
        return seq(x)

    def unary(self, x):
        w = self.rng.rand()
        if w < 0.40:
            return self.conv(x)
        if w < 0.55:
            return self.pool(x)
        if w < 0.67:
            return self.padcrop(x)
        if w < 0.79:
            return self.norm(x)
        if w < 0.91:
            return self.act_layer(x)
        return self.op_chain(x)

    # -- whole model ----------------------------------------------------
    def build(self):
        keras, kl, rng = self.keras, self.kl, self.rng
        if rng.rand() < 0.6:
            shape = (int(rng.randint(6, 20)), int(rng.randint(6, 20)),
                     int(rng.randint(1, 5)))
        else:
            shape = (int(rng.randint(8, 40)), int(rng.randint(1, 7)))
        inp = keras.Input(shape)
        x = inp
        for _ in range(rng.randint(2, 6)):
            w = rng.rand()
            if w < 0.70:
                x = self.unary(x)
            elif w < 0.88:
                x = self.merge_block(x)
            else:
                x = self.nested(x)
            if int(np.prod([int(d) for d in x.shape[1:]])) > 200_000:
                x = self.pool(x)
        # head
        if self._rank(x) == 2:
            x = (kl.GlobalAveragePooling2D() if rng.rand() < 0.5
                 else kl.GlobalMaxPooling2D())(x)
        else:
            x = (kl.GlobalAveragePooling1D() if rng.rand() < 0.5
                 else kl.GlobalMaxPooling1D())(x)
        if rng.rand() < 0.3:
            x = kl.Dense(int(rng.randint(4, 17)), activation=_act(rng))(x)
        out = kl.Dense(int(rng.randint(2, 8)),
                       activation=rng.choice(["softmax", "sigmoid", "linear"]))(x)
        return keras.Model(inp, out), shape


def check_seed(seed, tmpdir, flavor="k3"):
    """Build, save, import, compare. Returns (ok, message)."""
    import jax.numpy as jnp

    from audio_analysis_tpu.models import KerasModel

    gen = _Gen(seed, flavor=flavor)
    gen.keras.utils.set_random_seed(seed)
    model, shape = gen.build()
    rng = np.random.RandomState(seed + 1)
    x = rng.randn(3, *shape).astype(np.float32)
    ref = np.asarray(model.predict(x, verbose=0))
    if not np.all(np.isfinite(ref)):
        return True, "skipped (non-finite reference output)"
    p = str(Path(tmpdir) / f"fuzz_{flavor}_{seed}.keras")
    if flavor == "k2":
        model.save(p, save_format="keras")
    else:
        model.save(p)
    try:
        ours = np.asarray(KerasModel.load(p)(jnp.asarray(x)))
    except Exception as e:  # unsupported layer = fuzz finding
        stack = " -> ".join(type(l).__name__ for l in model.layers)
        return False, f"import/run failed: {e!r}\n  stack: {stack}"
    scale = max(1.0, float(np.max(np.abs(ref))))
    err = float(np.max(np.abs(ours - ref)))
    if err > REL_TOL * scale:
        stack = " -> ".join(type(l).__name__ for l in model.layers)
        return False, f"parity {err:.2e} > {REL_TOL * scale:.2e}\n  stack: {stack}"
    return True, f"ok (err {err:.1e})"


def run_sweep(n_seeds, start=0, log=lambda s: None, tmpdir=None, flavor="k3"):
    import tempfile

    failures = []
    with tempfile.TemporaryDirectory() as td:
        td = tmpdir or td
        t0 = time.time()
        for i in range(start, start + n_seeds):
            ok, msg = check_seed(i, td, flavor=flavor)
            if not ok:
                failures.append((i, msg))
                log(f"seed {i}: FAIL {msg}")
                if len(failures) >= 5:
                    break
            if (i - start + 1) % 25 == 0:
                log(f"{i - start + 1}/{n_seeds} seeds, "
                    f"{len(failures)} failures, {time.time() - t0:.0f}s")
    return failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_seeds", nargs="?", type=int, default=200)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--flavor", choices=("k3", "k2"), default="k3",
                    help="k2 = tf_keras (Keras 2) archives, the released-"
                         "checkpoint generation")
    args = ap.parse_args()
    failures = run_sweep(args.n_seeds, args.start, log=print, flavor=args.flavor)
    if failures:
        print(f"\n{len(failures)} FAILURES:")
        for s, m in failures:
            print(f"  seed {s}: {m}")
        sys.exit(1)
    print(f"\nall {args.n_seeds} seeds clean")


if __name__ == "__main__":
    main()
