import sys, json
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from bench import build_efficientnet_fixture, _env
from audio_analysis_tpu.io.modelconfig import ModelConfig
from audio_analysis_tpu.models.registry import load_classifier

tmp = Path("/tmp/aat_bench_models"); tmp.mkdir(exist_ok=True)
d = build_efficientnet_fixture(tmp)
cfg = ModelConfig.load(Path(d))
with _env(AAT_KERAS_BF16="1"):
    model = load_classifier(Path(d), cfg)
x = jnp.zeros((256, 160, 226, 3), jnp.bfloat16)
fwd = jax.jit(lambda v: model(v))
lowered = fwd.lower(x)
compiled = lowered.compile()
txt = compiled.as_text()
Path("/tmp/effnet_bf16_hlo.txt").write_text(txt)
ca = compiled.cost_analysis()
ca = ca[0] if isinstance(ca, list) else ca
keep = {k: v for k, v in ca.items() if isinstance(v, (int, float)) and ("bytes" in k or "flops" in k or "time" in k)}
print(json.dumps(keep, indent=1))
try:
    ma = compiled.memory_analysis()
    print("temp bytes:", getattr(ma, "temp_size_in_bytes", None),
          "output:", getattr(ma, "output_size_in_bytes", None),
          "arg:", getattr(ma, "argument_size_in_bytes", None))
except Exception as e:
    print("memory_analysis:", e)
print("HLO lines:", len(txt.splitlines()))
