classdef test_solver < matlab.unittest.TestCase
  % Clean-room port of the reference matcaffe solver test coverage
  % (matlab/+caffe/+test/test_solver.m there): construction with test
  % nets, iter/step/solve.  The fixture is a self-feeding DummyData net
  % (data layers are in-graph here, matching how this framework trains).

  properties
    solver
  end

  methods (Static)
    function model_file = dummy_net_file()
      model_file = tempname();
      fid = fopen(model_file, 'w');
      fprintf(fid, 'name: "t"\n');
      fprintf(fid, 'layer { name: "d" type: "DummyData" top: "x" top: "t"\n');
      fprintf(fid, '  dummy_data_param { shape { dim: 4 dim: 3 } shape { dim: 4 dim: 1 }\n');
      fprintf(fid, '    data_filler { type: "gaussian" std: 1.0 }\n');
      fprintf(fid, '    data_filler { type: "gaussian" std: 1.0 } } }\n');
      fprintf(fid, 'layer { name: "ip" type: "InnerProduct" bottom: "x" top: "p"\n');
      fprintf(fid, '  inner_product_param { num_output: 1\n');
      fprintf(fid, '    weight_filler { type: "gaussian" std: 0.1 } } }\n');
      fprintf(fid, 'layer { name: "l" type: "EuclideanLoss" bottom: "p" bottom: "t" top: "l" }\n');
      fclose(fid);
    end
  end

  methods
    function self = test_solver()
      model_file = caffe.test.test_solver.dummy_net_file();
      solver_file = tempname();
      fid = fopen(solver_file, 'w');
      fprintf(fid, 'net: "%s"\n', model_file);
      fprintf(fid, 'test_iter: 2 test_interval: 100 base_lr: 0.01 momentum: 0.9\n');
      fprintf(fid, 'weight_decay: 0.0005 lr_policy: "inv" gamma: 0.0001 power: 0.75\n');
      fprintf(fid, 'display: 100 max_iter: 10\n');
      fclose(fid);
      self.solver = caffe.Solver(solver_file);
      % also make sure get_solver runs
      caffe.get_solver(solver_file);
      delete(solver_file);
      delete(model_file);
    end
  end

  methods (Test)
    function test_nets_exposed(self)
      self.verifyEqual(self.solver.net.outputs, {'l'});
      self.verifyEqual(numel(self.solver.test_nets), 1);
      self.verifyEqual(self.solver.test_nets(1).outputs, {'l'});
    end

    function test_solve(self)
      self.verifyEqual(self.solver.iter(), 0);
      self.solver.step(3);
      self.verifyEqual(self.solver.iter(), 3);
      self.solver.solve();
      self.verifyEqual(self.solver.iter(), 10);
    end
  end
end
