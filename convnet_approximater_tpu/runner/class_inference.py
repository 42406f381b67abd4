"""Deploy-mode comparator (reference ``runner/class_inference.py:19-89`` and
``scripts/low_rank_exp_inference.py``): builds the original and approximated
models side by side, then times, FLOP-counts, and evaluates both — including
the post-``decomp()`` separable variant."""

from __future__ import annotations

import jax

from convnet_approximater_tpu.core import build_app
from convnet_approximater_tpu.classification import ValidateHelper
from convnet_approximater_tpu.filters import build_filter
from convnet_approximater_tpu.hooks.inference_time_hook import time_forward
from convnet_approximater_tpu.hooks.model_analysis import analyze_model
from convnet_approximater_tpu.layers import LowRankExpConvV1
from convnet_approximater_tpu.models import build_model
from convnet_approximater_tpu.utils import (
    get_cfg,
    get_logger,
    load_model,
    tree_get,
    tree_set,
)
from convnet_approximater_tpu.nn.module import _stable_fold

from .base import BaseRunner


class ClassInference(BaseRunner):
    """``exact_gelu`` (default True): deploy/parity surface — checkpoints
    fine-tuned in torch used erf GELU, so evaluate with it (the framework's
    perf surfaces default to the tanh form; ADVICE r1).  ``dtype``: serving
    dtype for weights + inputs ('float32' parity default; 'bfloat16' is the
    measured best-throughput serving mode, see doc/perf-notes.md)."""

    def __init__(self, checkpoint: str, batch_size: int = 16, input_size=(224, 224, 3),
                 do_decomp: bool = False, eval_cfg=None, rng=None,
                 exact_gelu: bool = True, dtype: str = "float32",
                 fold_bn=None, never_lose: bool = False,
                 s2d_stem: bool = False, pipeline_parallel: int = 1,
                 pipeline_mode: str = "stage", quantize: str = None):
        import os

        if exact_gelu and not os.environ.get("CAT_FAST_GELU"):
            os.environ.setdefault("CAT_EXACT_GELU", "1")
        self.dtype = jax.numpy.dtype(dtype)
        # deploy-time BN fold (deploy.fold_batchnorm): exact, inference-only;
        # default on for the bf16 serving surface (measured -0.29 ms/fwd),
        # off for the f32 parity surface
        self.fold_bn = (self.dtype != jax.numpy.float32) if fold_bn is None \
            else bool(fold_bn)
        cfg = get_cfg()
        self.cfg = cfg
        self.checkpoint = checkpoint
        self.batch_size = batch_size
        self.input_size = tuple(input_size)
        self.do_decomp = do_decomp
        self.never_lose = never_lose
        # opt-in serving rewrite (deploy.space_to_depth_stem): exact, but
        # a measured win is not yet established — keep off by default
        self.s2d_stem = s2d_stem
        # GPipe block pipelining over the mesh's model axis (parallel/pp.py):
        # for models too deep for one chip's HBM; eval-only, model must
        # expose backbone.enable_pipeline (MSCAN family).
        # pipeline_mode='whole' instead partitions the ENTIRE model —
        # stem/downsamples/blocks/norms/head — into FLOP-balanced stages
        # (parallel/pp_model.py) and times that forward; each device then
        # holds only its stage's weights (true weight partitioning).
        self.pipeline_parallel = int(pipeline_parallel)
        if pipeline_mode not in ("stage", "whole"):
            raise ValueError(f"pipeline_mode={pipeline_mode!r}")
        self.pipeline_mode = pipeline_mode
        # 'int8': PTQ the approximated serving surface (deploy.quantize_int8
        # after the BN fold).  Measured a real win on dense-conv families
        # (ResNet-18 1.60x / -50 1.25x vs bf16) and a loss on MSCAN
        # (fusion-split) — doc/perf-notes.md.  Calibrates on the eval
        # dataset when one is configured, else on synthetic batches.
        if quantize not in (None, "int8"):
            raise ValueError(f"quantize={quantize!r} (expected None or 'int8')")
        self.quantize = quantize
        self.eval_cfg = eval_cfg or {}
        self.rng = rng if rng is not None else jax.random.key(cfg.seed or 0)

        # approximated model in deploy mode
        self.app = build_app(cfg.app, deploy=True)
        self.filters = [build_filter(f) for f in cfg.filters] if cfg.filters else []
        self.new_model = build_model(cfg.model)
        # original model
        self.ori_model = build_model(cfg.model)

    def _maybe_pipeline(self, model):
        if self.pipeline_parallel <= 1 \
                or getattr(self, "pipeline_mode", "stage") == "whole":
            return  # whole-model partitioning engages per-report (needs
            # the final variables + input shape; see _report)
        from convnet_approximater_tpu.models.stage_exec import (
            resolve_pipeline_carrier,
        )

        backbone = resolve_pipeline_carrier(model)
        if backbone is None:
            get_logger().warning(
                f"pipeline_parallel={self.pipeline_parallel}: "
                f"{type(model).__name__} has no pipeline-capable backbone — ignored"
            )
            return
        from convnet_approximater_tpu.parallel import make_mesh

        n = jax.device_count()
        pp = self.pipeline_parallel
        if n % pp:
            raise ValueError(f"pipeline_parallel={pp} doesn't divide {n} devices")
        backbone.enable_pipeline(make_mesh(data=n // pp, model=pp))

    def _calib_batches(self, num_batches: int = 4, batch: int = 8):
        """Calibration inputs for int8 PTQ: real eval batches when the
        eval_cfg names a dataset (the representative-data PTQ protocol),
        synthetic normals otherwise (still exercises the scales end to
        end; accuracy-grade calibration needs real data)."""
        import jax.numpy as jnp

        if self.eval_cfg.get("dataset"):
            from convnet_approximater_tpu.data import Loader, build_dataset

            ds = build_dataset(dict(self.eval_cfg["dataset"]),
                               split=self.eval_cfg.get("split", "validation"))
            loader = Loader(ds, batch_size=batch, shuffle=False,
                            image_size=self.input_size[:2])
            out = []
            for i, (x, _) in enumerate(loader):
                if i >= num_batches:
                    break
                out.append(jnp.asarray(x).astype(self.dtype))
            if out:
                return out
        return [jax.random.normal(
                    jax.random.fold_in(self.rng, i),
                    (batch,) + self.input_size).astype(self.dtype) * 0.8
                for i in range(num_batches)]

    def _report(self, tag, model, variables, cast=True):
        import jax.numpy as jnp

        logger = get_logger()
        if self.fold_bn:
            from convnet_approximater_tpu.deploy import (
                enable_pw_matmul,
                fold_batchnorm,
            )

            fold_batchnorm(model, variables)  # idempotent; edits in place
            # measured -0.13 ms companion rewrite on the bf16 serving
            # surface (small-map 1x1s as flattened matmuls); structure-only
            enable_pw_matmul(model)
        if self.s2d_stem:
            from convnet_approximater_tpu.deploy import space_to_depth_stem

            space_to_depth_stem(model, variables)  # idempotent (type-gated)
        if self.dtype != jnp.float32:
            if cast:
                from convnet_approximater_tpu.utils import cast_floating

                variables = {"params": cast_floating(variables["params"], self.dtype),
                             "state": variables.get("state", {})}
            tag = f"{tag}/{self.dtype.name}"
        shape = (self.batch_size,) + self.input_size
        if self.pipeline_parallel > 1 and self.pipeline_mode == "whole":
            if not hasattr(model, "pipeline_units"):
                get_logger().warning(
                    f"pipeline_mode='whole': {type(model).__name__} has no "
                    f"pipeline_units() — timing the plain forward")
            else:
                from convnet_approximater_tpu.parallel import (
                    build_model_pipeline, make_mesh)

                n = jax.device_count()
                pp = self.pipeline_parallel
                mesh = make_mesh(data=n // pp, model=pp)
                apply_fn, report = build_model_pipeline(
                    model, variables, shape, mesh, dtype=self.dtype)
                for r in report:
                    get_logger().info(
                        f"[{tag}] pp stage {r['stage']}: {r['share']:.0%} "
                        f"flops, {len(r['units'])} units")
                pipe = jax.jit(apply_fn)
                _, _, times = time_forward(
                    model, variables, shape, num_iters=10, warmup=3,
                    dtype=self.dtype,
                    forward_fn=lambda p, s, x: pipe(
                        {"params": p, "state": s}, x))
                info = analyze_model(model, variables, shape, dtype=self.dtype)
                logger.info(
                    f"[{tag}] whole-model {pp}-stage pipeline fwd median "
                    f"{float(times.mean()) * 1e3:.3f} ms | "
                    f"MACs {info['macs'] / 1e6:.2f} M")
                if self.eval_cfg:
                    res = ValidateHelper(model, self.eval_cfg, variables).validate()
                    logger.info(f"[{tag}] eval: {res}")
                return
        _, _, times = time_forward(model, variables, shape, num_iters=10, warmup=3,
                                   dtype=self.dtype)
        info = analyze_model(model, variables, shape, dtype=self.dtype)
        logger.info(
            f"[{tag}] fwd median {float(times.mean()) * 1e3:.3f} ms | "
            f"MACs {info['macs'] / 1e6:.2f} M | params {info['params'] / 1e6:.2f} M"
        )
        if self.eval_cfg:
            res = ValidateHelper(model, self.eval_cfg, variables).validate()
            logger.info(f"[{tag}] eval: {res}")

    def run(self):
        self._maybe_pipeline(self.ori_model)
        self._maybe_pipeline(self.new_model)
        # original
        ori_vars = {"params": self.ori_model.init(self.rng), "state": self.ori_model.init_state()}
        ori_vars = self.ori_model.init_weights(ori_vars)
        self._report("original", self.ori_model, ori_vars)

        # approximated (deploy: initialize returns bare targets, then load ckpt)
        model = self.new_model
        model.register_switchable(self.app.src_type, self.filters)
        new_vars = {"params": model.init(self.rng), "state": model.init_state()}
        if self.cfg.structure_passes:
            # replay config-declared structure rewrites (chain pruning) so
            # the pruned checkpoint loads into matching shapes — same
            # semantics as Runner._apply_structure_passes / export_model
            import convnet_approximater_tpu.deploy as deploy_mod

            for p in self.cfg.structure_passes:
                p = dict(p)
                getattr(deploy_mod, p.pop("fn"))(model, new_vars, **p)
        for idx in range(model.length_switchable):
            name = model.switchable_names[idx]
            src = model.get_switchable_module(idx)
            tgt, tgt_params = self.app.initialize(
                src, tree_get(new_vars["params"], name), _stable_fold(self.rng, name)
            )
            model.set_switchable_module(idx, tgt, new_vars, {"params": tgt_params})
        new_vars = load_model(new_vars, self.checkpoint)
        self._report("approximated", model, new_vars)

        if self.do_decomp:
            for idx in range(model.length_switchable):
                name = model.switchable_names[idx]
                mod = model.get_switchable_module(idx)
                if isinstance(mod, LowRankExpConvV1):
                    tree_set(new_vars["params"], name, mod.decomp(tree_get(new_vars["params"], name)))
            self._report("decomposed", model, new_vars)

        if self.never_lose:
            # per-layer deploy arbiter: re-materialize every low-rank layer
            # that does not pay for itself at the model level, so the served
            # model is never slower than the dense original (VERDICT r2 #2)
            from convnet_approximater_tpu.deploy import never_lose_deploy

            shape = (self.batch_size,) + self.input_size
            res = never_lose_deploy(model, new_vars, shape, dtype=self.dtype)
            logger = get_logger()
            for row in res["layers"]:
                logger.info(f"[arbiter] {row['name']}: {row['kept']}")
            # persist the decision table (a deploy artifact: which layers
            # serve factored vs re-materialized, and the measured timings)
            work_dir = get_cfg().get("work_dir") or "."
            try:
                import json
                import os

                with open(os.path.join(work_dir, "never_lose_decisions.json"),
                          "w") as f:
                    json.dump({k: v for k, v in res.items()}, f, indent=2,
                              default=float)
                logger.info(f"arbiter decisions -> "
                            f"{work_dir}/never_lose_decisions.json")
            except OSError as e:  # pragma: no cover - disk-full etc.
                logger.warning(f"could not persist arbiter decisions: {e}")
            self._report("never-lose", model, new_vars)

        if self.quantize == "int8":
            import jax.numpy as jnp

            from convnet_approximater_tpu.deploy import (
                fold_batchnorm,
                quantize_int8,
            )
            from convnet_approximater_tpu.models.stage_exec import (
                resolve_pipeline_carrier,
            )
            from convnet_approximater_tpu.utils import cast_floating

            fold_batchnorm(model, new_vars)  # idempotent
            if self.dtype != jnp.float32:
                new_vars = {"params": cast_floating(new_vars["params"], self.dtype),
                            "state": new_vars.get("state", {})}
            # calibration taps cannot escape a pipelined stage
            # (models/stage_exec.py) — run calibration unpipelined, then
            # restore (quantized blocks stay structurally uniform)
            carrier = resolve_pipeline_carrier(model) \
                if self.pipeline_parallel > 1 else None
            if carrier is not None:
                carrier.enable_pipeline(None)
            nq = quantize_int8(model, new_vars, self._calib_batches())
            if carrier is not None:
                self._maybe_pipeline(model)
            get_logger().info(f"quantize_int8: {nq} convs quantized")
            # the surface was already cast pre-quantize; a re-cast in
            # _report would degrade the f32 w_scale/act_scale leaves
            self._report("int8", model, new_vars, cast=False)
