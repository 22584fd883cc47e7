"""Run the UNMODIFIED reference code under modern TensorFlow.

The reference (`/root/reference`, tf-kaldi-speaker) is TF 1.x: it does
``import tensorflow as tf`` and uses ``tf.placeholder`` / ``tf.layers.*`` /
``tf.contrib.layers.*``. TF 2.21 keeps the whole v1 API under
``tf.compat.v1`` EXCEPT two surfaces:

- ``tf.contrib`` (removed in TF2 entirely), of which the reference uses
  only ``layers.l2_regularizer``, ``layers.xavier_initializer`` and
  ``data.parallel_interleave``;
- ``tf.layers.{conv2d,dense,batch_normalization}`` (present but broken
  under Keras 3 — the symbols raise AttributeError).

``install()`` builds a module that proxies every attribute to
``tf.compat.v1`` and fills in those two surfaces with faithful
re-implementations (same variable names/shapes, same defaults: glorot
kernels, zero bias, VALID conv padding, BN epsilon 1e-3, regularization
losses in GraphKeys.REGULARIZATION_LOSSES, BN EMA assigns in
GraphKeys.UPDATE_OPS), registers it as ``sys.modules["tensorflow"]``, and
puts ``/root/reference`` on sys.path — after which ``from model.trainer
import Trainer`` imports and runs the reference's OWN training code,
byte-for-byte unmodified. scripts/make_tf_golden.py validated these exact
layer-shim semantics against the reference graphs (tests/test_tf_golden.py
pins forward/loss/grad/train-step parity through them).

Used by scripts/reference_convergence.py for head-to-head training-run
parity (VERDICT r3 item 1). Import and call ``install()`` BEFORE anything
imports tensorflow or the reference packages.
"""

import os
import sys
import types

REFERENCE_ROOT = os.environ.get("TFKS_REFERENCE_ROOT", "/root/reference")


def _build_layers(tf1):
    layers = types.ModuleType("tensorflow.layers")

    def dense(inputs, units, activation=None, use_bias=True,
              kernel_initializer=None, bias_initializer=None,
              kernel_regularizer=None, name=None, reuse=None, **kw):
        with tf1.variable_scope(name, default_name="dense", reuse=reuse):
            cin = int(inputs.shape[-1])
            kernel = tf1.get_variable(
                "kernel", [cin, units], tf1.float32,
                initializer=kernel_initializer
                or tf1.glorot_uniform_initializer(),
                regularizer=kernel_regularizer,
            )
            out = tf1.tensordot(inputs, kernel,
                                [[inputs.shape.ndims - 1], [0]])
            if use_bias:
                bias = tf1.get_variable(
                    "bias", [units], tf1.float32,
                    initializer=bias_initializer or tf1.zeros_initializer(),
                )
                out = tf1.nn.bias_add(out, bias)
        return activation(out) if activation is not None else out

    def conv2d(inputs, filters, kernel_size, strides=(1, 1),
               padding="valid", activation=None, use_bias=True,
               dilation_rate=(1, 1),
               kernel_initializer=None, bias_initializer=None,
               kernel_regularizer=None, name=None, reuse=None, **kw):
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size)
        if isinstance(strides, int):
            strides = (strides, strides)
        if isinstance(dilation_rate, int):
            dilation_rate = (dilation_rate, dilation_rate)
        with tf1.variable_scope(name, default_name="conv2d", reuse=reuse):
            cin = int(inputs.shape[-1])
            kernel = tf1.get_variable(
                "kernel", list(kernel_size) + [cin, filters], tf1.float32,
                initializer=kernel_initializer
                or tf1.glorot_uniform_initializer(),
                regularizer=kernel_regularizer,
            )
            out = tf1.nn.conv2d(
                inputs, kernel, strides=[1, strides[0], strides[1], 1],
                padding=padding.upper(),
                dilations=[1, dilation_rate[0], dilation_rate[1], 1],
            )
            if use_bias:
                bias = tf1.get_variable(
                    "bias", [filters], tf1.float32,
                    initializer=bias_initializer or tf1.zeros_initializer(),
                )
                out = tf1.nn.bias_add(out, bias)
        return activation(out) if activation is not None else out

    def batch_normalization(inputs, axis=-1, momentum=0.99, epsilon=1e-3,
                            center=True, scale=True, training=False,
                            name=None, reuse=None, **kw):
        assert axis in (-1, inputs.shape.ndims - 1), axis
        with tf1.variable_scope(name, default_name="batch_normalization",
                                reuse=reuse) as vs:
            c = int(inputs.shape[-1])
            gamma = tf1.get_variable(
                "gamma", [c], tf1.float32,
                initializer=tf1.ones_initializer()) if scale else None
            beta = tf1.get_variable(
                "beta", [c], tf1.float32,
                initializer=tf1.zeros_initializer()) if center else None
            moving_mean = tf1.get_variable(
                "moving_mean", [c], tf1.float32,
                initializer=tf1.zeros_initializer(), trainable=False)
            moving_var = tf1.get_variable(
                "moving_variance", [c], tf1.float32,
                initializer=tf1.ones_initializer(), trainable=False)
            if training:
                axes = list(range(inputs.shape.ndims - 1))
                mean, var = tf1.nn.moments(inputs, axes)
                # tf.layers semantics: EMA assigns land in UPDATE_OPS and
                # run under the trainer's control_dependencies
                # (reference trainer.py:435-436).
                tf1.add_to_collection(
                    tf1.GraphKeys.UPDATE_OPS,
                    tf1.assign(moving_mean,
                               moving_mean * momentum + mean * (1 - momentum)))
                tf1.add_to_collection(
                    tf1.GraphKeys.UPDATE_OPS,
                    tf1.assign(moving_var,
                               moving_var * momentum + var * (1 - momentum)))
            else:
                mean, var = moving_mean, moving_var
            return tf1.nn.batch_normalization(
                inputs, mean, var, beta, gamma, epsilon)

    layers.dense = dense
    layers.conv2d = conv2d
    layers.batch_normalization = batch_normalization
    return layers


def _build_contrib(tf2, tf1):
    contrib = types.ModuleType("tensorflow.contrib")
    contrib_layers = types.ModuleType("tensorflow.contrib.layers")

    def l2_regularizer(scale):
        # TF1 contrib: scale * l2_loss(w) = scale * sum(w^2)/2.
        def reg(weights):
            return tf1.multiply(scale, tf1.nn.l2_loss(weights),
                                name="l2_regularizer")
        return reg

    def xavier_initializer(uniform=True, seed=None, dtype=None):
        if uniform:
            return tf1.glorot_uniform_initializer(seed=seed)
        return tf1.glorot_normal_initializer(seed=seed)

    contrib_layers.l2_regularizer = l2_regularizer
    contrib_layers.xavier_initializer = xavier_initializer
    contrib.layers = contrib_layers

    contrib_data = types.ModuleType("tensorflow.contrib.data")
    contrib_data.parallel_interleave = tf2.data.experimental.parallel_interleave
    contrib.data = contrib_data
    return contrib


class _TF1Module(types.ModuleType):
    """Proxies attribute access to tf.compat.v1; `layers`/`contrib` are
    set directly and win over __getattr__."""

    def __init__(self, tf1):
        super().__init__("tensorflow")
        self._tf1 = tf1

    def __getattr__(self, name):
        return getattr(self._tf1, name)


class _Py2Line(str):
    """Python-2 compat: the reference's data_loader was written for py2 and
    calls ``line.decode()`` on lines read from TEXT-mode scp files
    (data_loader.py:49,95,103) while using plain str ops on others — a
    str subclass with a no-op decode() satisfies both."""

    def decode(self, *a, **k):
        return str(self)


class _Py2File:
    def __init__(self, f):
        self._f = f

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self._f.close()

    def __iter__(self):
        return (_Py2Line(line) for line in self._f)

    def readlines(self):
        return [_Py2Line(line) for line in self._f.readlines()]

    def __getattr__(self, name):
        return getattr(self._f, name)


class _Py2Random(__import__("random").Random):
    """Python-2 compat: the reference's loader workers decorrelate their
    RNGs with ``rd.jumpahead(seed)`` (data_loader.py:262), removed in py3.
    Re-seeding from (current state, n) preserves the intent — distinct
    streams per worker — without touching the reference code."""

    def jumpahead(self, n):
        self.seed("%r/%r" % (self.random(), n))


class _Py2Int(int):
    """Python-2 compat: ``len(x) / n`` slices in the reference loader
    (data_loader.py:506,802,894) rely on py2 floor division of ints. A
    module-local ``len`` returning this subclass restores that semantics
    (int/int floors; division by floats stays true division)."""

    def __truediv__(self, other):
        if isinstance(other, int):
            return _Py2Int(int(self) // other)
        return int(self) / other

    def __rtruediv__(self, other):
        if isinstance(other, int):
            return _Py2Int(other // int(self))
        return other / int(self)


class _Py2List(list):
    """Python-2 compat: the multitask loader asserts
    ``spk2features[spk] > num_segments`` (data_loader_v2.py:115) — a
    list-vs-int comparison that py2 resolves by type name ("list" > "int"
    is always True) and py3 rejects with TypeError. Restore the py2
    outcome for int comparands only."""

    def __gt__(self, other):
        if isinstance(other, int):
            return True
        return NotImplemented

    def __lt__(self, other):
        if isinstance(other, int):
            return False
        return NotImplemented


def patch_py2_data_loader():
    """Shadow ``open`` / ``random`` / ``len`` inside dataset.data_loader so
    text-mode lines carry a no-op .decode() (binary modes pass through
    untouched), ``Random.jumpahead`` exists, and ``len(...)/n`` floors like
    py2. Runtime module-global injection — the reference file itself is not
    modified."""
    import builtins
    import random as _random
    import types as _types

    import dataset.data_loader as dl

    def compat_open(path, mode="r", *a, **k):
        f = builtins.open(path, mode, *a, **k)
        return f if "b" in mode else _Py2File(f)

    dl.open = compat_open
    rand_mod = _types.ModuleType("random")
    rand_mod.__dict__.update(_random.__dict__)
    rand_mod.Random = _Py2Random
    dl.random = rand_mod
    dl.len = lambda x: _Py2Int(builtins.len(x))
    return dl


def patch_py2_mt_loader():
    """Same runtime-injection treatment for the multitask loader
    (dataset/multitask/data_loader_v2.py): py2 ``Random.jumpahead``, py2
    floor-dividing ``len()`` slices, ``np.sum`` over dict views (py2
    ``.values()`` returned a list), and the always-true list>int assert
    (see _Py2List). The reference file itself is never modified; the
    patches are inherited by the loader's fork()ed worker processes."""
    import builtins
    import random as _random
    import types as _types

    import numpy as _np

    import dataset.multitask.data_loader_v2 as dlv2

    rand_mod = _types.ModuleType("random")
    rand_mod.__dict__.update(_random.__dict__)
    rand_mod.Random = _Py2Random
    dlv2.random = rand_mod
    dlv2.len = lambda x: _Py2Int(builtins.len(x))

    np_mod = _types.ModuleType("numpy")
    np_mod.__dict__.update(_np.__dict__)

    def py2_sum(a, *args, **kw):
        if isinstance(a, (type({}.values()), type({}.keys()))):
            a = list(a)
        return _np.sum(a, *args, **kw)

    np_mod.sum = py2_sum
    dlv2.np = np_mod

    orig_start = dlv2.KaldiDataRandomQueueV2.start

    def start_with_py2_lists(self):
        self.spk2features = {
            k: _Py2List(v) for k, v in self.spk2features.items()
        }
        return orig_start(self)

    dlv2.KaldiDataRandomQueueV2.start = start_with_py2_lists
    return dlv2


def install():
    """Install the shim; returns the module now bound to 'tensorflow'.

    Idempotent. Must run before anything imports tensorflow (the real
    import happens here) or the reference packages.
    """
    if isinstance(sys.modules.get("tensorflow"), _TF1Module):
        return sys.modules["tensorflow"]
    import tensorflow as tf2

    tf1 = tf2.compat.v1
    tf1.disable_eager_execution()
    shim = _TF1Module(tf1)
    shim.layers = _build_layers(tf1)
    shim.contrib = _build_contrib(tf2, tf1)
    sys.modules["tensorflow"] = shim
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return shim
