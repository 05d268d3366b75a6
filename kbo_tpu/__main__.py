from kbo_tpu.cli import main

main()
