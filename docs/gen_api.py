"""Generate the API reference markdown (docs/api/*.md) by introspection.

Mirrors the reference's Sphinx autodoc pages
(``/root/reference/docs/api/zhusuan.*.rst``, one page per module) without a
Sphinx build: every public symbol (``__all__``, else non-underscore
module-level callables/classes) gets its signature and docstring.

Run: ``python docs/gen_api.py`` (from the repo root). Deterministic output;
CI-checkable with ``git diff --exit-code docs/api``.
"""

from __future__ import annotations

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

MODULES = [
    ("zhusuan_tpu.distributions", "Distribution zoo (reference zhusuan/distributions)"),
    ("zhusuan_tpu.framework", "Model framework: BayesianNet / MetaBayesianNet (reference zhusuan/framework)"),
    ("zhusuan_tpu.variational", "Variational objectives and estimators (reference zhusuan/variational)"),
    ("zhusuan_tpu.mcmc", "HMC and SGMCMC samplers (reference zhusuan/hmc.py, zhusuan/sgmcmc.py)"),
    ("zhusuan_tpu.evaluation", "IS marginal likelihood and AIS (reference zhusuan/evaluation.py)"),
    ("zhusuan_tpu.smc", "Annealed sequential Monte Carlo (beyond reference)"),
    ("zhusuan_tpu.ssm", "State-space models: particle filter/smoother + Kalman (beyond reference)"),
    ("zhusuan_tpu.gp", "Gaussian processes: kernels, exact/SGPR/SVGP (library-level; reference examples/gaussian_process)"),
    ("zhusuan_tpu.bijectors", "Constrained-latent sampling maps (beyond reference)"),
    ("zhusuan_tpu.diagnostics", "ESS and R-hat diagnostics (reference zhusuan/diagnostics.py)"),
    ("zhusuan_tpu.transform", "Normalizing flows (reference zhusuan/transform.py)"),
    ("zhusuan_tpu.utils", "Utilities (reference zhusuan/utils.py)"),
    ("zhusuan_tpu.parallel", "Device-mesh parallelism (replaces reference examples/utils/multi_gpu.py)"),
    ("zhusuan_tpu.fit", "Packaged scanned training loops (beyond reference)"),
    ("zhusuan_tpu.checkpoint", "Checkpoint / resume (beyond reference; SURVEY.md §5)"),
    ("zhusuan_tpu.profiling", "Profiling meters (SURVEY.md §5)"),
    ("zhusuan_tpu.ops", "Numerics guards and Pallas kernels"),
    ("zhusuan_tpu.testing", "Sampler validation: Geweke joint-distribution test (beyond reference)"),
    ("zhusuan_tpu.legacy", "Deprecated compat wrappers (reference zhusuan/legacy)"),
]


def _doc(obj) -> str:
    doc = inspect.getdoc(obj) or "*(no docstring)*"
    return doc


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _public_names(mod):
    if hasattr(mod, "__all__"):
        return list(mod.__all__)
    return sorted(
        n
        for n, v in vars(mod).items()
        if not n.startswith("_")
        and (inspect.isfunction(v) or inspect.isclass(v))
        and getattr(v, "__module__", "").startswith(mod.__name__)
    )


def render_module(name: str, title: str) -> str:
    mod = importlib.import_module(name)
    lines = ["# `{}`".format(name), "", title + ".", ""]
    mod_doc = inspect.getdoc(mod)
    if mod_doc:
        lines += [mod_doc, ""]
    seen = {}
    for sym in _public_names(mod):
        obj = getattr(mod, sym)
        if id(obj) in seen:
            lines += [
                "## `{}.{}`".format(name, sym),
                "",
                "Alias of [`{0}.{1}`](#class-{2}{1})."
                .format(name, seen[id(obj)], name.replace(".", "")),
                "",
            ]
            continue
        seen[id(obj)] = sym
        if inspect.isclass(obj):
            lines += [
                "## class `{}.{}{}`".format(name, sym, _sig(obj)),
                "",
                _doc(obj),
                "",
            ]
            for mname, meth in sorted(vars(obj).items()):
                if mname.startswith("_"):
                    continue
                if isinstance(meth, property):
                    pdoc = inspect.getdoc(meth) or ""
                    lines += [
                        "### property `{}`".format(mname),
                        "",
                        pdoc,
                        "",
                    ]
                elif inspect.isfunction(meth):
                    lines += [
                        "### `{}{}`".format(mname, _sig(meth)),
                        "",
                        _doc(meth),
                        "",
                    ]
        elif callable(obj):
            lines += [
                "## `{}.{}{}`".format(name, sym, _sig(obj)),
                "",
                _doc(obj),
                "",
            ]
        else:
            lines += [
                "## `{}.{}`".format(name, sym),
                "",
                "Value: `{!r}`".format(obj),
                "",
            ]
    return "\n".join(lines).rstrip() + "\n"


def main():
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "api")
    os.makedirs(out_dir, exist_ok=True)
    index = [
        "# API reference",
        "",
        "One page per module, mirroring the reference's Sphinx API pages",
        "(`docs/api/zhusuan.*.rst`). Generated by `docs/gen_api.py` —",
        "regenerate after changing public APIs.",
        "",
    ]
    for name, title in MODULES:
        md = render_module(name, title)
        fname = name + ".md"
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write(md)
        index.append("- [`{}`]({}) — {}".format(name, fname, title))
        print("wrote", fname)
    with open(os.path.join(out_dir, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print("wrote index.md")


if __name__ == "__main__":
    main()
