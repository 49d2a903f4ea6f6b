@echo off
rem gaplac launcher, Windows (ref parity: /root/reference/gaplac.cmd)
python -m gaplac_tpu.cli.main %*
