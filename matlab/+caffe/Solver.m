classdef Solver < handle
  % caffe.Solver - reference matlab/+caffe/Solver.m surface over
  % caffe_rtpose_tpu.api.SGDSolver (delegates through the Python engine).
  % Exposes the solver's train net and test nets as caffe.Net objects,
  % like the reference's construct-from-handle path.

  properties (Access = private)
    pysolver
  end
  properties (SetAccess = private)
    net
    test_nets
  end

  methods
    function self = Solver(solver_file)
      api = py.importlib.import_module('caffe_rtpose_tpu.api');
      self.pysolver = api.SGDSolver(solver_file);
      self.net = caffe.Net(self.pysolver.net);
      self.test_nets = caffe.Net.empty();
      n_test = double(py.len(self.pysolver.test_nets));
      for n = 1:n_test
        self.test_nets(n) = caffe.Net(self.pysolver.test_nets{int32(n)});
      end
    end

    function it = iter(self)
      it = double(self.pysolver.iter);
    end

    function restore(self, snapshot_filename)
      caffe.private.CHECK(ischar(snapshot_filename), ...
        'snapshot_filename must be a string');
      caffe.private.CHECK_FILE_EXIST(snapshot_filename);
      self.pysolver.restore(snapshot_filename);
    end

    function solve(self)
      self.pysolver.solve();
    end

    function step(self, iters)
      caffe.private.CHECK(isscalar(iters), 'iters must be positive integer');
      self.pysolver.step(int32(iters));
    end

    function snapshot(self, prefix)
      if nargin < 2
        self.pysolver.snapshot();
      else
        self.pysolver.snapshot(prefix);
      end
    end
  end
end
