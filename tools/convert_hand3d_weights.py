#!/usr/bin/env python
"""hand3d TF pickle weights -> flax param tree.

The reference distributes ColorHandPose3D weights as pickled
{var_name: ndarray} dicts ('HandSegNet/conv1_1/weights', ...) loaded via
tf.contrib.framework.assign_from_values
(reference hand_pose_estimators/CVPR2020_hand3d/nets/
ColorHandPose3DNetwork.py:34-59).  Because mmhand_tpu.models.hand3d names
its modules after the TF scopes and keeps TF layouts (conv HWIO, dense
[in, out]), the mapping is purely structural:

    <scope>/<layer>/weights -> [<scope>/]<layer>/conv/kernel   (convs)
    <scope>/<layer>/weights -> [<scope>/]<layer>/kernel        (dense fc_*)
    .../biases              -> .../bias

Usage (standalone or as a library for the tests):
    python tools/convert_hand3d_weights.py in.pickle out.npz
then load with load_hand3d_npz(npz_path, params_template).
"""

import pickle
import sys

import numpy as np


def tf_name_to_path(name, strip_scope=None):
    """'HandSegNet/conv1_1/weights' -> ('HandSegNet','conv1_1','conv','kernel')."""
    parts = name.split("/")
    if strip_scope and parts[0] == strip_scope:
        parts = parts[1:]
    leaf = parts[-1]
    layer = parts[-2]
    head = parts[:-1]
    is_dense = layer.startswith("fc_")
    if leaf == "weights":
        return tuple(head + (["kernel"] if is_dense else ["conv", "kernel"]))
    if leaf == "biases":
        return tuple(head + (["bias"] if is_dense else ["conv", "bias"]))
    raise KeyError(f"unrecognized TF variable name: {name}")


def tf_dict_to_params(weight_dict, template, strip_scope=None):
    """Merge a TF var dict into a (copied) flax param template; raises on
    shape mismatch; returns (params, n_loaded)."""
    import jax

    flat = {}

    def flatten(tree, prefix=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                flatten(v, prefix + (k,))
        else:
            flat[prefix] = np.asarray(tree)

    flatten(jax.tree.map(np.asarray, template))
    n = 0
    for name, value in weight_dict.items():
        try:
            path = tf_name_to_path(name, strip_scope)
        except KeyError:
            continue
        if path not in flat:
            continue
        value = np.asarray(value)
        if flat[path].shape != value.shape:
            raise ValueError(
                f"{name}: shape {value.shape} != template "
                f"{flat[path].shape}")
        flat[path] = value.astype(flat[path].dtype)
        n += 1

    def unflatten(prefix=()):
        keys = {p[len(prefix)] for p in flat if p[:len(prefix)] == prefix
                and len(p) > len(prefix)}
        out = {}
        for k in keys:
            sub = prefix + (k,)
            if sub in flat:
                out[k] = flat[sub]
            else:
                out[k] = unflatten(sub)
        return out

    return unflatten(), n


def load_hand3d_npz(npz_path, template, strip_scope=None):
    data = np.load(npz_path)
    return tf_dict_to_params({k: data[k] for k in data.files}, template,
                             strip_scope)


def main():
    in_path, out_path = sys.argv[1], sys.argv[2]
    with open(in_path, "rb") as fh:
        weight_dict = pickle.load(fh, encoding="latin1")
    arrays = {k: np.asarray(v) for k, v in weight_dict.items()}
    np.savez(out_path, **arrays)
    print(f"wrote {len(arrays)} arrays to {out_path}")


if __name__ == "__main__":
    main()
