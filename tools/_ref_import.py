"""Import helper: load reference torch modules with stubs for absent deps.

Used ONLY for golden-data generation at development time (never at test time).
"""
import sys, types

def _stub(name, attrs=()):
    if name in sys.modules:
        return sys.modules[name]
    import importlib.machinery
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for a in attrs:
        setattr(m, a, object)
    sys.modules[name] = m
    return m

def install_stubs():
    for name in ["torchvision", "torchvision.transforms", "imageio", "imageio.v3", "imageio_ffmpeg",
                 "modelscope", "ftfy", "librosa", "pandas"]:
        _stub(name)
    import types as _t
    sys.modules["imageio"].__path__ = []  # mark as package
    sys.modules["torchvision"].__path__ = []
    sys.modules["torchvision.transforms"].InterpolationMode = type("IM", (), {"BICUBIC": 3})
    sys.modules["torchvision.transforms"].Compose = object
    sys.modules["torchvision.transforms"].Normalize = object
    sys.modules["torchvision.transforms"].Resize = object
    sys.modules["torchvision.transforms"].CenterCrop = object
    sys.modules["torchvision.transforms"].ToTensor = object
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["imageio"].v3 = sys.modules["imageio.v3"]
    sys.modules["torchvision"].transforms = _t.SimpleNamespace(Compose=object, ToTensor=object)
    sys.modules["ftfy"].fix_text = lambda x: x
    sys.modules["modelscope"].snapshot_download = lambda *a, **k: None
    sys.modules["modelscope"].dataset_snapshot_download = lambda *a, **k: None
    sys.path.insert(0, "/root/reference/animation")

if __name__ == "__main__":
    install_stubs()
    from diffsynth.diffusion.flow_match import FlowMatchScheduler
    s = FlowMatchScheduler("Wan"); s.set_timesteps(10, shift=5.0)
    print("flow ok", s.sigmas[:2])
    from diffsynth.models.wan_video_dit import WanModel
    from diffsynth.models.wan_video_vae import WanVideoVAE38
    from diffsynth.models.wan_video_text_encoder import WanTextEncoder
    print("models ok")
