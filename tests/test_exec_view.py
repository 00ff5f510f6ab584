"""Execution-sequence view golden (reference ie/test/exec_test.py:66-98,
derivation :19-62) — exact repr parity including stems and rule names."""

from ie_ray.semantics.exec_view import execution_sequence

WSJ0001_2 = r'''
(<T S[dcl] 0 2>
  (<T S[dcl] 1 2>
    (<T NP 0 1>
      (<T N 1 2>
        (<L N/N NNP NNP Mr. N_107/N_107>)
        (<L N NNP NNP Vinken N>)
      )
    )
    (<T S[dcl]\NP 0 2>
      (<L (S[dcl]\NP)/NP VBZ VBZ is (S[dcl]\NP_112)/NP_113>)
      (<T NP 0 2>
        (<T NP 0 1>
          (<L N NN NN chairman N>)
        )
        (<T NP\NP 0 2>
          (<L (NP\NP)/NP IN IN of (NP_109\NP_109)/NP_110>)
          (<T NP 0 2>
            (<T NP 0 1>
              (<T N 1 2>
                (<L N/N NNP NNP Elsevier N_107/N_107>)
                (<L N NNP NNP N.V. N>)
              )
            )
            (<T NP[conj] 1 2>
              (<L , , , , ,>)
              (<T NP 1 2>
                (<L NP[nb]/N DT DT the NP[nb]_48/N_48>)
                (<T N 1 2>
                  (<L N/N NNP NNP Dutch N_107/N_107>)
                  (<T N 1 2>
                    (<L N/N VBG VBG publishing N_107/N_107>)
                    (<L N NN NN group N>)
                  )
                )
              )
            )
          )
        )
      )
    )
  )
  (<L . . . . .>)
)'''

EXPECTED = [
    '<PushOp>:(Mr, N/N, NNP)',
    '<PushOp>:(Vinken, N, NNP)',
    '<ExecOp>:(2, FA N)',
    '<ExecOp>:(1, LP NP)',
    '<PushOp>:(be, (S[dcl]\\NP)/NP, VBZ)',
    '<PushOp>:(chairman, N, NN)',
    '<ExecOp>:(1, LP NP)',
    '<PushOp>:(of, (NP\\NP)/NP, IN)',
    '<PushOp>:(Elsevier, N/N, NNP)',
    '<PushOp>:(N.V, N, NNP)',
    '<ExecOp>:(2, FA N)',
    '<ExecOp>:(1, LP NP)',
    '<PushOp>:(,, ,, ,)',
    '<PushOp>:(the, NP[nb]/N, DT)',
    '<PushOp>:(Dutch, N/N, NNP)',
    '<PushOp>:(publish, N/N, VBG)',
    '<PushOp>:(group, N, NN)',
    '<ExecOp>:(2, FA N)',
    '<ExecOp>:(2, FA N)',
    '<ExecOp>:(2, FA NP)',
    '<ExecOp>:(2, RP NP[conj])',
    '<ExecOp>:(2, RCONJ NP)',
    '<ExecOp>:(2, FA NP\\NP)',
    '<ExecOp>:(2, BA NP)',
    '<ExecOp>:(2, FA S[dcl]\\NP)',
    '<ExecOp>:(2, BA S[dcl])',
    '<PushOp>:(., ., .)',
    '<ExecOp>:(2, LP S[dcl])',
]


def test_exec_sequence_exact():
    assert execution_sequence(WSJ0001_2) == EXPECTED
