"""Wheel build with the pre-compiled native host runtime.

Role of the reference's dist pipeline (extension binaries built per
platform, .github/workflows/dist_pipeline.yml): the wheel ships
``infera_tpu/runtime/_build/libinfera_host.so`` compiled at build time, so
installs never need a toolchain. If no compiler is available the wheel
still works — runtime/native.py JIT-builds from the bundled source on first
use and falls back to numpy marshalling beyond that.
"""

import pathlib
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildPyWithNative(build_py):
    def run(self):
        super().run()
        src = pathlib.Path(__file__).parent / "infera_tpu/runtime/src/infera_host.cpp"
        out_dir = pathlib.Path(self.build_lib) / "infera_tpu/runtime/_build"
        out = out_dir / "libinfera_host.so"
        # -march=native deliberately omitted: wheels must run on any x86-64
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", str(src),
               "-o", str(out), "-pthread"]
        try:
            out_dir.mkdir(parents=True, exist_ok=True)
            subprocess.run(cmd, check=True, timeout=300)
            print(f"built native host runtime: {out}")
        except Exception as e:  # wheel stays installable; JIT-build covers it
            print(f"native prebuild skipped ({e}); runtime will JIT-build")


cmdclass = {"build_py": BuildPyWithNative}

try:
    from wheel.bdist_wheel import bdist_wheel as _bdist_wheel

    class BdistWheelImpure(_bdist_wheel):
        """The bundled .so makes the wheel platform-specific."""

        def finalize_options(self):
            super().finalize_options()
            self.root_is_pure = False

    cmdclass["bdist_wheel"] = BdistWheelImpure
except ImportError:
    pass

setup(cmdclass=cmdclass)
