from ctts_tpu.runtime.native import NativeEngine, native_available
