function CHECK_FILE_EXIST(filename)
  % reference matlab/+caffe/private/CHECK_FILE_EXIST.m behavior
  if exist(filename, 'file') == 0
    error(['file "' filename '" does not exist']);
  end
end
