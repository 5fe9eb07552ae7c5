classdef Solver < handle
  % caffe.Solver - reference matlab/+caffe/Solver.m surface over
  % caffe_rtpose_tpu.api.SGDSolver (delegates through the Python engine).

  properties (Access = private)
    pysolver
  end

  methods
    function self = Solver(solver_file)
      api = py.importlib.import_module('caffe_rtpose_tpu.api');
      self.pysolver = api.SGDSolver(solver_file);
    end

    function step(self, iters)
      self.pysolver.step(int32(iters));
    end

    function it = iter(self)
      it = double(self.pysolver.iter);
    end

    function solve(self)
      self.pysolver.solve();
    end

    function snapshot(self, prefix)
      if nargin < 2
        self.pysolver.snapshot();
      else
        self.pysolver.snapshot(prefix);
      end
    end

    function restore(self, state_file)
      self.pysolver.restore(state_file);
    end

    function n = net(self)
      n = self.pysolver.net;
    end
  end
end
