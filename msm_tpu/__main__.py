from msm_tpu.cli import main

main()
