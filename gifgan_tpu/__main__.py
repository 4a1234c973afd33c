from gifgan_tpu.cli import main

main()
