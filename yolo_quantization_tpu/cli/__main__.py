from yolo_quantization_tpu.cli.main import main

main()
