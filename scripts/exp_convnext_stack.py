import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cat_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from bench import KEY, log, time_apply, run_pipeline
from convnet_approximater_tpu.core import DwSepRep
from convnet_approximater_tpu.deploy import quantize_int8
from convnet_approximater_tpu.filters import DepthwiseConvFilter
from convnet_approximater_tpu.models import ConvNeXt
from convnet_approximater_tpu.utils import cast_floating

B = 64
x = jax.random.normal(KEY, (B, 224, 224, 3)).astype(jnp.bfloat16)
m = ConvNeXt(arch="tiny", num_classes=1000)
v = {"params": m.init(KEY)}
m, v = run_pipeline(m, v, DwSepRep(ranks=1, strip_matmul=False),
                    [DepthwiseConvFilter()])
v["params"] = cast_floating(v["params"])
log("ConvNeXt-T DwSepRep r1 bf16 (the 7.56 ms surface):")
t_dw = time_apply(m, v, x)
calib = [jax.random.normal(jax.random.fold_in(KEY, i),
                           (8, 224, 224, 3)).astype(jnp.bfloat16) * 0.7
         for i in range(2)]
nq = quantize_int8(m, v, calib)
log(f"ConvNeXt-T DwSepRep r1 + int8 ({nq} modules):")
t_q = time_apply(m, v, x)
log(f"ConvNeXt-T stack summary (b={B}): DwSepRep bf16 {t_dw*1e3:.2f} ms -> "
    f"+int8 {t_q*1e3:.2f} ms = {t_dw/t_q:.3f}x ({B/t_q:.0f} img/s)")
