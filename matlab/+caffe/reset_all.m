function reset_all()
  % Drop live nets/solvers (reference caffe.reset_all); Python GC owns them.
  py.gc.collect();
end
