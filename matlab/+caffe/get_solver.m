function solver = get_solver(solver_file)
% solver = get_solver(solver_file)
%   Construct a Solver from a solver prototxt (reference
%   matlab/+caffe/get_solver.m).

assert(ischar(solver_file), 'solver_file must be a string');
assert(exist(solver_file, 'file') == 2, 'file does not exist');
solver = caffe.Solver(solver_file);

end
