"""Run the real reference ZhuSuan (TF1 code) under TF 2.x via tf.compat.v1.

The reference at /root/reference is TF1-era; this image has tensorflow
2.21.0. ``tf.compat.v1`` still provides Session/placeholder/variable_scope
etc., and the two internal imports the reference uses
(``tensorflow.python.client.session``, used for session-run conversion
registration in framework/bn.py:10, and
``tensorflow.python.training.moving_averages``, variational/exclusive_kl.py:9)
still resolve. Strategy: pre-import those internals under their real module
paths, then alias ``sys.modules['tensorflow']`` to the v1 compat module so
``import tensorflow as tf`` inside the reference sees the TF1 API.

Call :func:`install` BEFORE importing ``zhusuan``. Returns the tf1 module.
"""

import sys


def install():
    import tensorflow  # noqa: F401  (real module, populates tensorflow.*)
    import tensorflow.python.client.session  # noqa: F401
    import tensorflow.python.training.moving_averages  # noqa: F401
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    sys.modules["tensorflow"] = tf1
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    return tf1
