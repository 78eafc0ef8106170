from juicy_tpu.cli import main

main()
