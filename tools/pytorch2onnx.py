"""ONNX-export surface shim.

The reference's tools/pytorch2onnx.py exports its torch model to ONNX for
deployment. arfe_tpu's models are JAX programs, so the portable-deployment
path is StableHLO serialization (tools/export_stablehlo.py) — the
IR that TPU/GPU/CPU runtimes consume directly. This shim exists for CLI
surface parity and forwards to the StableHLO exporter.
"""
import sys


def main():
    print('arfe_tpu models are JAX programs; ONNX is not the native export '
          'format.\nUse the StableHLO exporter instead (same CLI shape):\n\n'
          '    python tools/export_stablehlo.py CONFIG [CHECKPOINT] '
          '--out model.stablehlo\n', file=sys.stderr)
    if len(sys.argv) > 1:
        print('Forwarding to export_stablehlo with the given arguments...',
              file=sys.stderr)
        import runpy
        sys.argv[0] = 'export_stablehlo.py'
        runpy.run_path(
            __file__.replace('pytorch2onnx.py', 'export_stablehlo.py'),
            run_name='__main__')
    else:
        sys.exit(2)


if __name__ == '__main__':
    main()
