{
  "targets": [
    {
      "target_name": "stt_tpu",
      "sources": ["addon.c"],
      "libraries": ["-L<(module_root_dir)/../../stt_tpu/native", "-lstt_tpu"],
      "ldflags": ["-Wl,-rpath,<(module_root_dir)/../../stt_tpu/native"],
      "cflags": ["-Wall", "-Wextra"]
    }
  ]
}
